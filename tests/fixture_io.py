"""Shared test-fixture I/O helpers (not a test module)."""

import os
import shutil


def one_file(df, d, name, block=1 << 14):
    """Write ``df`` as exactly ONE parquet file at ``d/name`` (staged
    Spark write + os.replace), with a small row-group size so
    multi-row-group fixtures stay cheap. The single shared copy — five
    test modules used to carry near-identical private versions."""
    tmp = os.path.join(d, f"_stage_{name}")
    (df.coalesce(1).write.mode("overwrite")
     .option("parquet.block.size", str(block)).parquet(tmp))
    part = next(f for f in sorted(os.listdir(tmp))
                if f.endswith(".parquet"))
    os.replace(os.path.join(tmp, part), os.path.join(d, name))
    shutil.rmtree(tmp, ignore_errors=True)
