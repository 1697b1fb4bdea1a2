"""SD verification pinned to the reference's verifying_sd example snapshot
(examples/test_examples/snapshots/snap_test_examples_pytest.py,
verifying_sd_output): PollNum -> [9, 11] Time over network_logs.csv needs
exactly 14 operations (confidence 17/31 = 0.5484) -- deletions at rows
12, 13, 30 and insertion gaps 2->3 (exactly 3) and 11->14 (8 to 9) -- and
the example's scripted repair (delete those rows, bridge each gap with
+10-second records reusing the preceding PollNum) verifies clean."""

import pandas as pd

from pyspark_validator.checks.sd import sd_check

LOGS = "/root/reference/examples/datasets/sd_verification_datasets/network_logs.csv"


def test_network_logs_optimal_matches_snapshot(spark):
    pdf = pd.read_csv(LOGS)
    pdf["__id"] = range(len(pdf))
    chk = sd_check(spark.createDataFrame(pdf), "PollNum", "Time", g1=9.0, g2=11.0)
    row = chk.optimal(id_col="__id").collect()[0]
    assert row["ops"] == 14 and not row["holds"]
    assert abs(row["confidence"] - (31 - 14) / 31) < 1e-9
    assert sorted(row["deletions"]) == [12, 13, 30]
    assert sorted(
        (i["left_id"], i["right_id"], i["min_insertions"], i["max_insertions"])
        for i in row["insertions"]
    ) == [(2, 3, 3, 3), (11, 14, 8, 9)]


def test_scripted_repair_verifies_clean(spark):
    pdf = pd.read_csv(LOGS)
    fixed = pdf.drop(index=[12, 13, 30]).reset_index(drop=True)
    inserts = []
    rows = fixed.to_dict("records")
    out = []
    for i, r in enumerate(rows):
        out.append(r)
        if i + 1 < len(rows):
            t, nt = r["Time"], rows[i + 1]["Time"]
            while nt - t > 11:
                t += 10
                out.append({"PollNum": r["PollNum"], "Time": t})
    repaired = pd.DataFrame(out)
    assert len(repaired) == 39  # the snapshot's fixed table
    row = (
        sd_check(spark.createDataFrame(repaired), "PollNum", "Time", g1=9.0, g2=11.0)
        .optimal()
        .collect()[0]
    )
    assert row["ops"] == 0 and row["holds"] and row["confidence"] == 1.0
