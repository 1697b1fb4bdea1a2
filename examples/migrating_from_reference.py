"""Port a Desbordante script with minimal edits.

Every pybind verifier family from the reference (src/python_bindings/*) has a
compat analog with the SAME getter names and the same load_data/execute
lifecycle (algorithm.cpp:76-96) -- the edits are the import line and passing a
SparkSession. Run: python examples/migrating_from_reference.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

# reference:  import desbordante
# here:
from pyspark_validator import compat, get_spark

spark = get_spark(master="local[4]", shuffle_partitions=8)

TABLE = pd.DataFrame(
    {
        "id": [1, 2, 3, 4, 5, 6],
        "dept": ["a", "a", "a", "b", "b", "b"],
        "salary": [10.0, 12.0, 11.0, 50.0, 52.0, 9000.0],
        "grade": ["x", "x", "y", "z", "z", "z"],
    }
)

# reference:  algo = desbordante.ucc_verification.algorithms.Default()
#             algo.load_data(table=(path, ',', True)); algo.execute(ucc_indices=[1])
ucc = compat.UccVerifier(spark)
ucc.load_data(TABLE)
ucc.execute(ucc_indices=["dept"])
print("UCC(dept) holds:", ucc.ucc_holds(),
      "| violating clusters:", ucc.get_num_clusters_violating_ucc())

fd = compat.FdVerifier(spark)
fd.load_data(TABLE)
fd.execute(lhs_indices=["dept"], rhs_indices=["grade"])
print("FD dept->grade holds:", fd.fd_holds(), "| g1:", round(fd.get_error(), 4))

afd = compat.AfdMetricCalculator(spark)
afd.load_data(TABLE)
afd.execute(["dept"], ["grade"], metric="tau")
print("AFD tau(dept->grade):", round(afd.get_result(), 4))

pfd = compat.PfdVerifier(spark)
pfd.load_data(TABLE)
pfd.execute(["dept"], ["grade"], error_measure="per_tuple")
print("PFD per-tuple error:", round(pfd.get_error(), 4))

mfd = compat.MetricVerifier(spark)
mfd.load_data(TABLE)
mfd.execute(["dept"], ["salary"], metric="euclidean", parameter=5.0)
print("MFD(salary within 5 per dept) holds:", mfd.mfd_holds(),
      "| worst cluster:", mfd.get_highlights()[:1])

nd = compat.NdVerifier(spark)
nd.load_data(TABLE)
nd.execute(["dept"], ["grade"], weight=1)
print("ND dept->grade weight 1 holds:", nd.nd_holds,
      "| real weight:", nd.real_weight)

od = compat.OdVerifier(spark)
od.load_data(TABLE)  # pandas input -> positional row ids, like the reference
od.execute(ofd_context=["dept"], ofd_right="grade")
print("AOD removal set (0-based rows):", od.get_removal_set(),
      "| error:", round(od.get_error(), 4))

cfd = compat.CfdVerifier(spark)
cfd.load_data(TABLE)
cfd.execute(lhs=[("dept", "b"), ("grade", None)], rhs=("grade", "z"),
            minsup=2, minconf=0.9)
print("CFD (dept=b, grade=_) -> grade=z:", cfd.cfd_holds(),
      "| support:", cfd.get_real_support(),
      "| confidence:", round(cfd.get_real_confidence(), 4))

pac = compat.PacVerifier(spark)
pac.load_data(TABLE)
pac.execute("salary", domain=(0.0, 100.0), exact=True)
print("Domain PAC salary in [0,100]:", pac.get_pac(),
      "| outliers:", pac.get_highlights(eps_1=0.0))

dyn = compat.DynamicFdVerifier(spark)
dyn.load_data(TABLE, lhs_indices=["dept"], rhs_indices=["grade"])
dyn.execute(insert=[(7, "a", 13.0, "y")])
print("Dynamic FD after insert: holds:", dyn.fd_holds(),
      "| error clusters:", dyn.get_num_error_clusters())

# --- mining facades (depth <= 2; bind_fd.cpp / bind_ucc.cpp / bind_ind.cpp)
tane = compat.Tane(spark)
tane.load_data(TABLE)
tane.execute(error=0.0)
print("TANE minimal FDs:", [str(f) for f in tane.get_fds()])
tane.execute(error=0.3)
print("TANE AFDs (g1 <= 0.3):", [str(f) for f in tane.get_fds()])
tane.execute(error=0.3, error_measure="pdep")
print("TANE AFDs (1-pdep <= 0.3):", [str(f) for f in tane.get_fds()])

hyucc = compat.HyUCC(spark)
hyucc.load_data(TABLE)
hyucc.execute()
print("HyUCC minimal UCCs:", [str(u) for u in hyucc.get_uccs()])

pyro_ucc = compat.PyroUCC(spark)
pyro_ucc.load_data(TABLE)
pyro_ucc.execute(error=0.2)
print("PyroUCC minimal AUCCs (<= 0.2):", [str(u) for u in pyro_ucc.get_uccs()])

mind = compat.Mind(spark)
mind.load_data({"emp": TABLE, "ref": pd.DataFrame({"dept_ref": ["a", "b", "c"]})})
mind.execute(error=0.5)
print("Mind AINDs:", [f"{i} (e={i.get_error():.2f})" for i in mind.get_inds()])

fastod = compat.Fastod(spark)
fastod.load_data(TABLE)
fastod.execute()
print("Fastod simple ODs:", fastod.get_simple_ods())
print("Fastod asc ODs:", fastod.get_asc_ods())
print("Fastod desc ODs:", fastod.get_desc_ods())

pfdtane = compat.PFDTane(spark)
pfdtane.load_data(TABLE)
pfdtane.execute(error=0.3, error_measure="per_tuple")
print("PFDTane PFDs (per-tuple <= 0.3):", [str(f) for f in pfdtane.get_fds()])

split = compat.Split(spark)
split.load_data(TABLE[["salary", "grade"]].assign(rank=[1, 2, 2, 3, 3, 4]))
split.execute()
print("Split DDs:", [str(d) for d in split.get_dds()][:4])

adc = compat.FastADC(spark)
adc.load_data(TABLE)
adc.execute(evidence_threshold=0.05)
print("FastADC DCs:", len(adc.get_dcs()), "| first:",
      str(adc.get_dcs()[0]) if adc.get_dcs() else "-")

des = compat.DES(spark)
des.load_data(TABLE[["dept", "salary", "grade"]])
des.execute(population_size=10, max_fitness_evaluations=15)
print("DES NARs:", [f"{r} (fit={r.fitness:.3f})" for r in des.get_nars()][:2])

hymd = compat.HyMD(spark)
hymd.load_data(TABLE[["dept", "grade"]].astype(str))
hymd.execute()
print("HyMD MDs:", [str(m) for m in hymd.get_mds()][:3])

order = compat.Order(spark)
order.load_data(TABLE[["dept", "id"]])
order.execute()
print("Order list-ODs:", order.get_list_ods())

cind = compat.CindAlgorithm(spark)
cind.load_data({"t1": TABLE[["dept", "grade"]], "t2": TABLE[["grade", "dept"]]})
cind.execute(error=0.5, validity=0.5, completeness=0.3, condition_type="row")
first = cind.get_cinds()[0]
print("CIND:", first.get_ind_string(), "| conditions:", first.conditions_number())

# CINDVerifier: reference basket semantics + the pybind condition_values list
cv = compat.CindVerifier(spark)
cv.load_data(TABLE[["id", "dept", "grade"]], TABLE[["grade"]])
cv.execute([2], [0], condition_values=["_", "a"], min_validity=0.9,
           min_completeness=0.0)
print("CindVerifier:", f"validity={cv.get_real_validity():.3f}",
      f"completeness={cv.get_real_completeness():.3f}",
      f"baskets={cv.get_supporting_baskets()}/{cv.get_included_baskets_total()}",
      "| holds:", cv.holds())

ap = compat.Apriori(spark)
ap.load_data(TABLE[["id", "dept"]].astype(str), input_format="singular")
ap.execute(minconf=0.5)
print("Apriori ARs:", [str(a) for a in ap.get_ars()][:2],
      "| items:", ap.get_itemnames())

cords = compat.Cords(spark)
cords.load_data(TABLE[["dept", "grade", "salary"]])
cords.execute()
print("Cords SFDs:", [str(f) for f in cords.get_fds()],
      "| correlations:", [str(c) for c in cords.get_correlations()])

# --- graph + sequence tier (round 5) ---------------------------------------
GRAPH_DATA = "/root/reference/test_input_data/graph_data"
SEQ_DATA = "/root/reference/test_input_data/sequence_data"

# reference:  algo = desbordante.gfd_verification.algorithms.GfdValid()
#             algo.load_data(graph=path, gfd=[gfd_path]); algo.execute()
gv = compat.GfdValid(spark)
gv.load_data(graph=f"{GRAPH_DATA}/quadrangle.dot",
             gfd=[f"{GRAPH_DATA}/quadrangle_gfd.dot"])
gv.execute()
print("GfdValid satisfied GFDs:", len(gv.get_gfds()))

# reference:  desbordante.gfd_mining.algorithms.GfdMiner()
gm = compat.GfdMiner(spark)
gm.load_data(graph=f"{GRAPH_DATA}/blogs_graph.dot", gfd_k=2, gfd_sigma=3)
gm.execute()
print("GfdMiner mined:", len(gm.get_gfds()),
      "| first:", str(gm.get_gfds()[0]).strip().splitlines()[:2])

# reference:  desbordante.gspan.GSpan()
gs = compat.GSpan(spark)
gs.load_data(graph_database=f"{GRAPH_DATA}/gspan_test_simple.txt")
gs.execute(minsup=0.6)
print("GSpan frequent subgraphs:", len(gs.get_frequent_subgraphs()))

# reference:  desbordante.fem.MaxFEM()
mf = compat.MaxFEM(spark)
mf.load_data(sequence=f"{SEQ_DATA}/maxfem_baseline.txt")
mf.execute(minimum_support=2, window_size=2)
print("MaxFEM maximal episodes:", mf.get_max_frequent_episodes())

spark.stop()
