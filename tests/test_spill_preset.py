"""The memory-starved session preset (VERDICT r10 item 6): the forced-spill
thresholds the round-10 spill-axis sweep certified 205/205 are exported as
``session.memory_starved_conf()`` so a real cluster deployment can opt into
the certified-green profile. This test exercises the preset on a headliner:
same rows with and without it, and the config_invariance harness keeps
consuming the same dict (no drift between the deployable preset and the
certified sweep)."""

from __future__ import annotations

import __spark_entry__ as entrymod
from etl_pipeline_last_fm_spark.session import memory_starved_conf


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_memory_starved_preset_is_result_invariant(spark, sf_dir):
    conf = memory_starved_conf()
    qs = entrymod.queries()
    # flagship star join + agg, and the windowed top-k (the two headliner
    # families that buffer in window/SMJ operators under the preset).
    for name in ("flagship_royalties", "windowed_top_k"):
        base = _rows(qs[name](spark, sf_dir))
        for k, v in conf.items():
            spark.conf.set(k, v)
        try:
            starved = _rows(qs[name](spark, sf_dir))
        finally:
            for k in conf:
                spark.conf.unset(k)
        assert starved == base, name


def test_sweep_uses_the_preset_verbatim():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "config_invariance",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "config_invariance.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    preset = memory_starved_conf()
    assert preset.items() <= mod.CONFIG_SPILL.items()
    # and the preset carries ONLY runtime-settable SQL confs
    assert all(k.startswith("spark.sql.") for k in preset)
