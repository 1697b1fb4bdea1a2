"""Algebraic-constraint (AC) validation — the analog of the reference's
mining_ac example (examples/basic/mining_ac.py, BHUNT VLDB'03): delivery
minus dispatch dates cluster into "fast" and "slow" ranges; rows whose
difference falls outside every range are delivery anomalies.

Composition: ac_check builds disjunctive ranges by distributed sorted-gap
clustering (one shuffle); exceptions() validates rows against a standing
range list. The reference's randomized fuzzy sample becomes a deterministic
value-hash sample_fraction, so re-runs agree. A NAR rule over the same
table shows the companion qualities rollup.

Run:  python examples/verifying_ac.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark_validator as pv

spark = pv.get_spark(app_name="verify-ac", master="local[4]", shuffle_partitions=8)

# the reference example's cargo table shape: dispatch/delivery day-of-month
rows = [
    (0, 3, 1), (1, 8, 1), (2, 8, 2), (3, 10, 4), (4, 7, 4), (5, 14, 10),
    (6, 21, 17), (7, 30, 1), (8, 30, 27), (9, 26, 22), (10, 25, 20),
    (11, 25, 20), (12, 19, 14), (13, 16, 11), (14, 16, 1), (15, 26, 4),
    (16, 23, 7), (17, 26, 10), (18, 30, 9), (19, 26, 6), (20, 23, 3),
    (21, 20, 1), (22, 23, 4), (23, 27, 8), (24, 29, 11), (25, 28, 10),
    (26, 18, 7), (27, 28, 10), (28, 19, 1),
]
cargo = spark.createDataFrame(rows, "id long, delivery long, dispatch long")

check = pv.ac_check(cargo, "delivery", "dispatch", "-", weight=0.1)
print("Ranges of (delivery - dispatch) at weight 0.1:")
check.ranges().show()

print("Rows outside the standing constraint 'delivery within 2..7 or 15..22 days':")
check.exceptions(["id"], ranges=[(2.0, 7.0), (15.0, 22.0)]).show()

print("NAR rule {dispatch in [1, 10]} => {delivery - dispatch in [10, 25]}:")
transit = cargo.selectExpr("id", "dispatch", "delivery - dispatch AS transit")
pv.nar_check(transit, {"dispatch": (1, 10)}, {"transit": (10, 25)}).qualities().show()

spark.stop()
