#!/usr/bin/env python
"""WARC container-shape scale probe (round 14): exercise the reader at
the real CommonCrawl shape — ONE container holding tens of thousands
of per-record gzip members — and measure what the crawl-index design
actually buys:

  * container build rate (records/s through the distributed writer),
  * full sequential decode (the no-index baseline: gunzip-all + frame
    walk),
  * seek-in reads of K random records via recorded (offset, length)
    member slices (the random-access pattern the offsets exist for),
    reported as per-record p50/p99.

Usage: python scripts/warc_scale_probe.py [SF_DIR] [DOCS_PER_CONTAINER]
Defaults: /tmp/sf1 (50k documents -> one 50k-record container), 50000.
Prints one JSON line.
"""

import json
import os
import random
import sys
import time
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    per = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000

    from datafusion_async_parquet_index_spark.operators.web import (
        _gunzip_members,
        decode_warc,
        parse_http_response,
        synthesize_warc_containers,
    )
    from datafusion_async_parquet_index_spark.session import get_spark

    spark = get_spark("warc_probe")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    rows = synthesize_warc_containers(spark, sf_dir,
                                      docs_per_container=per).collect()
    build_s = time.perf_counter() - t0
    n_records = sum(len(r["doc_ids"]) for r in rows)
    biggest = max(rows, key=lambda r: len(r["doc_ids"]))
    payload = bytes(biggest["payload"])
    offsets = list(biggest["offsets"])
    lengths = list(biggest["lengths"])

    # full sequential decode: the no-index baseline a reader without
    # recorded offsets pays for ANY record
    t0 = time.perf_counter()
    recs = decode_warc(_gunzip_members(payload))
    full_s = time.perf_counter() - t0
    assert len(recs) == len(offsets) + 1  # + warcinfo

    # seek-in reads: K random records through their member slices
    k = min(1000, len(offsets))
    rng = random.Random(7)
    picks = rng.sample(range(len(offsets)), k)
    lat = []
    for i in picks:
        t0 = time.perf_counter()
        d = zlib.decompressobj(wbits=31)
        rec_bytes = d.decompress(
            payload[offsets[i]:offsets[i] + lengths[i]])
        assert d.eof and not d.unused_data
        rec = decode_warc(rec_bytes)[0]
        parse_http_response(rec["payload"])
        lat.append((time.perf_counter() - t0) * 1000)
    lat.sort()

    print(json.dumps({
        "sf_dir": sf_dir,
        "docs_per_container": per,
        "n_containers": len(rows),
        "n_records": n_records,
        "container_bytes": len(payload),
        "records_in_biggest": len(offsets),
        "build_sec": round(build_s, 3),
        "build_records_per_sec": round(n_records / build_s, 1),
        "full_sequential_decode_sec": round(full_s, 3),
        "seek_reads": k,
        "seek_read_ms_p50": round(lat[k // 2], 4),
        "seek_read_ms_p99": round(lat[int(k * 0.99) - 1], 4),
        "seek_vs_full_speedup": round(
            full_s * 1000 / max(lat[k // 2], 1e-9), 1),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
