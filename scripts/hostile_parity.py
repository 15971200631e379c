"""Hostile-parity sweep (round 9 depth): run EVERY oracle-paired registry
query on an adversarially perturbed copy of sf0.001 and require the same
engine-vs-engine parity the driver checks on benign data.

Why: the round-8 sign-domain bug hid for a full round because the driver
testdata is benign — non-negative values, unique keys, naturally ordered
input. The property tests attack single operators; this sweep attacks the
WHOLE registry with data-shape adversaries that preserve semantics (both
engines read the SAME perturbed parquet, so any divergence is an
implementation artifact, never a data artifact):

- ``reorder``: identical rows, scrambled row order + multi-file layout.
  A failure means a query depends on incidental input order (an unpinned
  tie-break, a first()/head() over an unordered frame). At 100 TB input
  order is an accident of the scan schedule, so order-dependence is a
  latent wrong-answer bug even when today's single-file read hides it.
- ``dupes``: duplicate CONTENT appended to every fact table under FRESH
  primary keys (the realistic adversary: real corpora repeat text,
  vectors and event payloads, but key columns stay keys — an early
  version of this variant duplicated the PKs verbatim and mostly
  measured violations of the tables' own key contracts). A failure
  means dedup/aggregation/ranking paths disagree between the
  implementation and its oracle under content multiplicity.
- ``nulls``: NULLs injected into non-key attribute columns on a
  deterministic stride. A failure means the implementation's null
  semantics (null-safe equality, null ordering at a LIMIT boundary,
  aggregate null-skipping, string ops on NULL) diverge from the oracle's.

Preconditions: a small per-variant skip-list exempts queries whose
DOCUMENTED input contract the variant violates (e.g. the calibration
family raise_error's on NULL/negative scores BY DESIGN; dupes break the
exact-duplicate-free contract of nothing — fact multiplicity is legal).
Every skip must cite the docstring that states the contract.

Usage:
    python scripts/hostile_parity.py reorder|dupes|nulls|gauntlet [--names ...]

Prints one JSON summary line and a per-query table; non-zero exit if any
non-skipped query fails parity or errors on one engine only.
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_pipeline_last_fm_spark.session import get_spark
from etl_pipeline_last_fm_spark.schemas import TESTDATA_TABLES

#: source fixture; override with HOSTILE_SRC_DIR (e.g. sf0.01 for a
#: 10x-denser boundary-collision sweep)
SRC = os.environ.get("HOSTILE_SRC_DIR", "/root/testdata/sf0.001")

#: key columns that must never be perturbed (join validity)
KEYS = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey", "n_regionkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

#: ``dupes``: per-table PK remap for the duplicated copy — content is
#: copied verbatim, the key column(s) move to a fresh universe so key
#: contracts hold. lineitem keeps l_orderkey (join integrity to orders)
#: and shifts only l_linenumber; orders' duplicates become childless
#: orders (legal). OFF = 1 << 33 clears every testdata key range.
DUPE_OFF = 1 << 33
DUPE_PK_SHIFT = {
    "orders": ("o_orderkey", DUPE_OFF),
    "lineitem": ("l_linenumber", 1000),
    "events": ("event_id", DUPE_OFF),
    "documents": ("doc_id", DUPE_OFF),
    "embeddings": ("vec_id", DUPE_OFF),
}

#: per-table non-key attribute columns NULLed (key % 11 == 3) in ``nulls``.
#: Timestamps and text are included: a 100 TB corpus HAS null timestamps
#: and null documents, and both engines see the same ones.
NULL_COLS = {
    "customer": ["c_acctbal", "c_mktsegment"],
    "supplier": ["s_acctbal"],
    "part": ["p_size", "p_retailprice", "p_type"],
    "orders": ["o_totalprice", "o_orderpriority"],
    "lineitem": ["l_quantity", "l_discount", "l_tax", "l_returnflag"],
    "events": ["value", "props", "event_type"],
    "documents": ["text", "lang"],
    "embeddings": ["label"],
}


def _null_stride_cond(table: str):
    key = KEYS[table][0]
    return F.col(key) % 11 == 3


def build(spark, variant: str, out_dir: str) -> None:
    for table in TESTDATA_TABLES:
        src = f"{SRC}/{table}.parquet"
        if not os.path.exists(src):
            continue
        df = spark.read.parquet(src)
        if variant == "gauntlet":
            # all three adversaries composed: NULL stride first (so the
            # duplicated copies carry NULLs too), then content dupes
            # under fresh keys, then the scramble — interaction bugs
            # (e.g. a null-row duplicate crossing a tie-break) only
            # show up here
            if table in NULL_COLS:
                cond = _null_stride_cond(table)
                for c in NULL_COLS[table]:
                    df = df.withColumn(
                        c, F.when(cond, F.lit(None)).otherwise(F.col(c))
                    )
            if table in DUPE_PK_SHIFT:
                key = KEYS[table][0]
                pk, off = DUPE_PK_SHIFT[table]
                df = df.unionAll(
                    df.where(F.col(key) % 13 == 0).withColumn(
                        pk, F.col(pk) + F.lit(off)
                    )
                )
            scrambled = df.withColumn(
                "__h", F.xxhash64(*[F.col(c) for c in df.columns])
            )
            df = (
                scrambled.repartition(7, "__h")
                .sortWithinPartitions("__h")
                .drop("__h")
            )
        elif variant == "reorder":
            # deterministic scramble: hash-partition + hash-sort on all
            # columns -> same multiset, adversarial order, 7-file layout
            scrambled = df.withColumn(
                "__h", F.xxhash64(*[F.col(c) for c in df.columns])
            )
            df = (
                scrambled.repartition(7, "__h")
                .sortWithinPartitions("__h")
                .drop("__h")
            )
        elif variant == "dupes" and table in DUPE_PK_SHIFT:
            key = KEYS[table][0]
            pk, off = DUPE_PK_SHIFT[table]
            dup = df.where(F.col(key) % 13 == 0).withColumn(
                pk, F.col(pk) + F.lit(off)
            )
            df = df.unionAll(dup)
        elif variant == "nulls" and table in NULL_COLS:
            cond = _null_stride_cond(table)
            for c in NULL_COLS[table]:
                df = df.withColumn(
                    c, F.when(cond, F.lit(None)).otherwise(F.col(c))
                )
        df.write.mode("overwrite").parquet(f"{out_dir}/{table}.parquet")


#: variant -> {query_name: documented-contract citation}
SKIPS: dict[str, dict[str, str]] = {
    "reorder": {},
    "dupes": {},
    "nulls": {},
    "gauntlet": {},
}


def main() -> None:
    variant = sys.argv[1] if len(sys.argv) > 1 else "reorder"
    assert variant in ("reorder", "dupes", "nulls", "gauntlet"), variant
    only = None
    if "--names" in sys.argv:
        only = set(sys.argv[sys.argv.index("--names") + 1].split(","))
    tag = SRC.rstrip("/").rsplit("/", 1)[-1]
    out_dir = f"/tmp/hostile_{tag}_{variant}"
    spark = get_spark(app_name=f"hostile-parity-{variant}")
    # The cached dataset is keyed by the BUILD PARAMETERS, not just the
    # (sf, variant) pair: if the adversary definition changes (NULL_COLS,
    # the dupe shift, the stride, the build logic itself), a stale /tmp
    # dataset must be rebuilt, or the sweep certifies against an outdated
    # adversary (ADVICE r9).
    import hashlib
    import inspect

    fingerprint = hashlib.sha256(
        repr((NULL_COLS, DUPE_PK_SHIFT, DUPE_OFF, KEYS,
              inspect.getsource(build), inspect.getsource(_null_stride_cond))
             ).encode()
    ).hexdigest()
    marker = os.path.join(out_dir, "_BUILT")
    stale = (
        not os.path.exists(marker)
        or open(marker).read().strip() != fingerprint
    )
    if stale:
        shutil.rmtree(out_dir, ignore_errors=True)
        build(spark, variant, out_dir)
        with open(marker, "w") as fh:
            fh.write(fingerprint)
        print(f"built {variant} dataset at {out_dir}", flush=True)

    import __spark_entry__ as entrymod
    from tests.oracle_utils import assert_matches_oracle

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    skips = SKIPS[variant]

    passed, failed, errored, skipped = [], {}, {}, []
    for name in queries:
        if only and name not in only:
            continue
        if name in skips:
            skipped.append(name)
            continue
        try:
            df = queries[name](spark, out_dir)
            if name in oracles:
                assert_matches_oracle(df, oracles[name], out_dir, name=name)
            else:
                df.limit(5).collect()
            passed.append(name)
        except AssertionError as exc:
            failed[name] = str(exc)[:300]
        except Exception as exc:  # noqa: BLE001 — record and continue
            errored[name] = f"{type(exc).__name__}: {exc}"[:300]
        print(
            f"[{variant}] {name}: "
            f"{'PASS' if name in passed else 'FAIL' if name in failed else 'ERR'}",
            flush=True,
        )

    summary = {
        "variant": variant,
        "n_pass": len(passed),
        "n_fail": len(failed),
        "n_err": len(errored),
        "n_skip": len(skipped),
        "failed": failed,
        "errored": errored,
        "skipped": skipped,
    }
    print(json.dumps(summary))
    sys.exit(0 if not failed and not errored else 1)


if __name__ == "__main__":
    main()
