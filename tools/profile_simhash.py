"""One-off profiling harness for dedup_simhash stages at sf0.1.

Times each stage of simhash_pairs separately (fingerprint agg, chunk
join, verify) so the 18.4s seen in BENCH_r03 can be attributed before
optimizing. Not part of the test suite.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cis555_search_engine_spark.session import get_spark
from cis555_search_engine_spark.entry_queries import load
from cis555_search_engine_spark.operators.dedup import simhash60, simhash_pairs

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark(cores=32)
docs = load(spark, SF, "documents")
docs.count()  # warm the scan

t0 = time.time()
sims = simhash60(docs)
n = sims.count()
t1 = time.time()
print(f"simhash60 (fingerprints): {t1-t0:.2f}s rows={n}")

t0 = time.time()
pairs = simhash_pairs(docs, max_hamming=3)
np_ = pairs.count()
t1 = time.time()
print(f"simhash_pairs end-to-end: {t1-t0:.2f}s pairs={np_}")
