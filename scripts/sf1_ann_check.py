#!/usr/bin/env python
"""ANN physical layouts one decade above bench scale (round-5 verdict
ask #5): at sf1 (200k vectors, gen_sf1.py), measure for
``sim_ivf_layout_topk`` and ``sim_ivfpq_layout_topk``

  - wall-clock (layout build separated from query serve),
  - cells touched (probed vs total — the partition-pruning fraction),
  - recall@k against the brute-force exact top-k,

plus the logical twins (``sim_ivf_topk`` / ``sim_ivfpq_topk``) and the
brute-force baseline for comparison. Results go into README/SURVEY §8.

Usage:  python scripts/sf1_ann_check.py [sf1_dir]
        (generates /tmp/sf1 via gen_sf1.py when missing)
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"


def _materialize(df):
    df.write.mode("overwrite").format("noop").save()


def _pairs(df):
    return {(r["query_id"], r["cand_id"]) for r in df.collect()}


def main() -> None:
    if not os.path.exists(os.path.join(SF1, "embeddings.parquet")):
        subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(__file__), "gen_sf1.py"),
             "/root/testdata/sf0.1", SF1],
            check=True)

    from datafusion_async_parquet_index_spark.session import get_spark
    from datafusion_async_parquet_index_spark.operators import similarity as S

    spark = get_spark("sf1-ann", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    n_vec = spark.read.parquet(
        os.path.join(SF1, "embeddings.parquet")).count()
    out = {"sf_dir": SF1, "n_vectors": n_vec, "topk": S.TOPK}

    def run(name, fn, probe_attr=False):
        t0 = time.perf_counter()
        df = fn()
        _materialize(df)
        first = time.perf_counter() - t0
        t0 = time.perf_counter()
        _materialize(fn())
        warm = time.perf_counter() - t0
        rec = {"first_sec": round(first, 2), "warm_sec": round(warm, 2)}
        if probe_attr and S.LAST_LAYOUT_PROBE:
            rec["probe"] = dict(S.LAST_LAYOUT_PROBE)
        rec["_df"] = df
        out[name] = rec
        print(name, {k: v for k, v in rec.items() if k != "_df"},
              flush=True)
        return df

    brute = run("bruteforce", lambda: S.sim_bruteforce_topk(spark, SF1))
    ivf_log = run("ivf_logical", lambda: S.sim_ivf_topk(spark, SF1))
    ivf_phys = run("ivf_layout",
                   lambda: S.sim_ivf_layout_topk(spark, SF1), True)
    pq_log = run("ivfpq_logical", lambda: S.sim_ivfpq_topk(spark, SF1))
    pq_phys = run("ivfpq_layout",
                  lambda: S.sim_ivfpq_layout_topk(spark, SF1), True)

    truth = _pairs(brute)
    for name, df in [("ivf_logical", ivf_log), ("ivf_layout", ivf_phys),
                     ("ivfpq_logical", pq_log), ("ivfpq_layout", pq_phys)]:
        got = _pairs(df)
        out[name]["recall_at_k"] = round(len(truth & got) / len(truth), 4)
        out[name].pop("_df", None)
    out["bruteforce"].pop("_df", None)

    print(json.dumps(out, indent=1))
    with open("/tmp/sf1_ann_check.json", "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
