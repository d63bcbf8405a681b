# check lorawan queries
import sys

for n in [n for n in list(sys.modules) if n.startswith("rolaguard")]:
    del sys.modules[n]
from rolaguard_data_collectors_spark.oracle import check_all
from rolaguard_data_collectors_spark.functions import lorawan_queries

names = [q.name for q in lorawan_queries.QUERIES]
res = check_all(spark, "/root/testdata/sf0.001", names=names)  # noqa: F821
for r in res:
    print(("OK " if r.ok else "FAIL") + ("" if r.exact_match else " ~"), r.name, r.detail[:200])
print("CHECK-DONE", sum(r.ok for r in res), "/", len(res))
