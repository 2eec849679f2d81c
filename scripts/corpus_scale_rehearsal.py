"""Corpus-family 10x/100x scaling rehearsal.

The dedup/similarity designs claim near-linear scaling (bucketed joins,
no all-pairs). This script MEASURES that: it times the family at sf0.1
(5k docs) and at a synthesized 10x corpus (50k docs: each sf0.1 document
replicated with per-replica id offsets, half the replicas perturbed with a
unique token so the corpus contains both true near-dup groups and
distinct content — the realistic re-post-heavy ingest shape), then prints
the scale factor per operator. Numbers land in SCALE.md.

Writes scratch data under /tmp; touches nothing in the repo or testdata.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

_REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from pyspark.sql import DataFrame  # noqa: E402

from binance_etl_clickhouse_spark.operators import neardup  # noqa: E402
from binance_etl_clickhouse_spark.operators.text import simhash_wide  # noqa: E402
from binance_etl_clickhouse_spark.session import get_spark  # noqa: E402
from binance_etl_clickhouse_spark.tables import load_table  # noqa: E402
from binance_etl_clickhouse_spark.testing.corpusscale import (  # noqa: E402
    synth_replicated_corpus,
)

SF_DIR = "/root/testdata/sf0.1"
SCRATCH = "/tmp/corpus_rehearsal_50k"
REPLICAS = 10


def synth_10x(spark) -> DataFrame:
    # shared synthesizer (also used by bench.py's per-round corpus_scale
    # section) — see testing/corpusscale.py for the replica/perturbation
    # rationale
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    return synth_replicated_corpus(docs, SCRATCH, replicas=REPLICAS)


def _noop(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark(app_name="corpus-rehearsal")
    base = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    print("base docs:", base.count())
    big = synth_10x(spark)
    print("10x docs:", big.count())

    results: dict[str, dict[str, float]] = {}
    # warmup pass first: the first execution of each family pays JIT /
    # codegen / Arrow init, which would otherwise inflate the 1x numbers
    for tag, df in (("warmup", base), ("1x", base), ("10x", big)):
        out: dict[str, float] = {}

        def run(name, thunk):
            t0 = time.time()
            thunk()
            out[name] = round(time.time() - t0, 2)
            print(f"  {tag} {name}: {out[name]} s", flush=True)

        run("exact_dedup", lambda: _noop(neardup.exact_dup_canonical(df)))
        # band_cap stated EXPLICITLY so the measured semantics are pinned in
        # the label: since r7 the operator defaults to the capped production
        # path, and SCALE.md's series tracks capped vs uncapped separately
        run(
            "minhash_lsh_pairs_cap64",
            lambda: _noop(neardup.minhash_lsh_pairs(df, threshold=0.5, band_cap=64)),
        )
        run(
            "minhash_lsh_pairs_uncapped",
            lambda: _noop(neardup.minhash_lsh_pairs(df, threshold=0.5, band_cap=None)),
        )
        run(
            "simhash_banded_pairs",
            lambda: _noop(
                neardup.simhash_banded_pairs(
                    simhash_wide(df), n_bands=4, sig_bits=60, max_hamming=3
                )
            ),
        )
        if tag != "warmup":
            results[tag] = out

    print("\nscale factors (10x data should be ~10x time if linear):")
    for name in results["1x"]:
        a, b = results["1x"][name], results["10x"][name]
        print(f"  {name}: {a} s -> {b} s  ({round(b / max(a, 0.01), 1)}x)")


if __name__ == "__main__":
    main()
