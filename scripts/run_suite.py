"""spark-submit driver shim.

    spark-submit --py-files dist/pyspark_validator.zip \
        [--master ... --conf spark.sql.shuffle.partitions=2048] \
        scripts/run_suite.py --spec suite.json

spark-submit puts --py-files archives on the driver's sys.path before this
script runs, so the engine is imported from the shipped zip -- this file has
no other dependencies and never needs the repo checkout on the cluster.
Exit code 0 = all checks hold, 3 = violations found (see
pyspark_validator/__main__.py for the spec format).
"""

import sys

from pyspark_validator.__main__ import main

if __name__ == "__main__":
    sys.exit(main())
