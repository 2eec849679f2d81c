"""Bench artifact contract (r9 verdict item 2).

The r9 driver bench was taken on a loaded machine and came out uniformly
1.3-2.8x inflated vs the idle run of identical code. bench.py now brackets
the query tiers with a busy-cores load sentinel (/proc/stat, sampled while
the bench sleeps), re-sweeps the headline+dialect tiers once when a
bracket saw load (per-query best of the two passes), and stamps the
artifact ``loaded`` only when EVERY sentinel sample exceeded the idle
envelope. These tests pin the pure policy, the sensor's sanity, and the
artifact shape without paying for a full bench run.
"""

from __future__ import annotations

import json

import bench


class TestSentinelPolicy:
    def test_idle_run_no_resweep_not_loaded(self):
        p = bench.sentinel_policy([0.02, 0.0], envelope_cores=1.0)
        assert p["resweep"] is False
        assert p["loaded"] is False
        assert p["samples_busy_cores"] == [0.02, 0.0]
        assert p["envelope_cores"] == 1.0

    def test_one_loaded_bracket_triggers_resweep(self):
        # load during the first pass only: re-sweep, but the artifact is
        # NOT stamped loaded if any later sample came back under envelope
        p = bench.sentinel_policy([4.8, 0.02], envelope_cores=1.0)
        assert p["resweep"] is True
        assert p["loaded"] is False

    def test_persistent_load_stamps_loaded(self):
        # every sample over envelope: even best-of-2 timings are suspect
        p = bench.sentinel_policy([4.8, 2.1, 1.7, 1.9], envelope_cores=1.0)
        assert p["resweep"] is True
        assert p["loaded"] is True

    def test_load_clearing_mid_run_not_loaded(self):
        # loaded pass 1 -> idle re-sweep: best-of keeps the idle pass
        p = bench.sentinel_policy([4.8, 1.7, 0.04, 0.01], envelope_cores=1.0)
        assert p["resweep"] is True
        assert p["loaded"] is False

    def test_boundary_is_strict(self):
        # exactly at the envelope = within it
        p = bench.sentinel_policy([1.0, 1.0], envelope_cores=1.0)
        assert p["resweep"] is False and p["loaded"] is False

    def test_sensor_unavailable_never_counts_as_load(self):
        # -1.0 = /proc/stat unreadable: recorded, but neither resweep nor
        # loaded may key off it
        p = bench.sentinel_policy([-1.0, -1.0], envelope_cores=1.0)
        assert p["resweep"] is False and p["loaded"] is False
        assert p["samples_busy_cores"] == [-1.0, -1.0]
        mixed = bench.sentinel_policy([-1.0, 3.0], envelope_cores=1.0)
        assert mixed["resweep"] is True and mixed["loaded"] is True


class TestCpuProbePolicy:
    """r10 verdict item 4: the busy-cores sentinel cannot see
    throughput-degrading machine STATE (frequency/cache) — r10 saw 84.3 s
    vs 65.2 s on identical idle code, both sentinel-clean. A fixed
    single-core pure-Python probe with a committed idle envelope closes
    that blind spot: slow probe + idle busy-cores => same re-sweep."""

    def test_slow_probe_with_idle_cores_triggers_resweep(self):
        p = bench.sentinel_policy(
            [0.02, 0.01],
            envelope_cores=1.0,
            probe_samples=[0.55, 0.02],
            probe_envelope_s=0.30,
        )
        assert p["resweep"] is True
        assert p["loaded"] is False  # second probe bracket was clean

    def test_persistently_slow_probe_stamps_loaded(self):
        p = bench.sentinel_policy(
            [0.02, 0.01, 0.02],
            envelope_cores=1.0,
            probe_samples=[0.55, 0.48, 0.61],
            probe_envelope_s=0.30,
        )
        assert p["resweep"] is True
        assert p["loaded"] is True

    def test_idle_probe_and_cores_stay_clean(self):
        p = bench.sentinel_policy(
            [0.02, 0.01],
            envelope_cores=1.0,
            probe_samples=[0.22, 0.24],
            probe_envelope_s=0.30,
        )
        assert p["resweep"] is False and p["loaded"] is False
        assert p["samples_probe_s"] == [0.22, 0.24]
        assert p["probe_envelope_s"] == 0.30

    def test_probe_unavailable_never_counts(self):
        p = bench.sentinel_policy(
            [0.02], envelope_cores=1.0, probe_samples=[-1.0], probe_envelope_s=0.30
        )
        assert p["resweep"] is False and p["loaded"] is False

    def test_probe_sensor_runs_and_is_positive(self):
        v = bench._run_cpu_probe(iters=50_000, runs=1)
        assert 0.0 < v < 5.0


class TestSentinelSensor:
    def test_busy_cores_reads_this_machine(self):
        # short window to keep the suite fast; just pin the contract:
        # a float, bounded by the core count, -1.0 only if unreadable
        import os

        v = bench._run_sentinel(sample_s=0.2)
        assert v == -1.0 or 0.0 <= v <= (os.cpu_count() or 1) + 1


class TestArtifactShape:
    def test_payload_carries_sentinel_and_loaded(self, monkeypatch, tmp_path):
        """Run bench.main() with every expensive seam stubbed: the artifact
        written to BENCH_OUT must carry the driver-contract keys plus the
        r10 sentinel block, and the compact last line must parse as JSON
        with the loaded stamp."""
        fake_q = {"q_fast": 0.1, "q_slow": 0.3}
        fake_d = {"d1": 0.05}
        monkeypatch.setattr(bench, "HEADLINE", list(fake_q))
        monkeypatch.setattr(bench, "DIALECT_TIER", list(fake_d))

        # sentinel: first bracket loaded -> one re-sweep -> then idle
        samples = iter([4.0, 2.1, 0.03, 0.03])
        monkeypatch.setattr(
            bench, "_run_sentinel", lambda sample_s=3.0: next(samples)
        )
        probes = iter([0.21, 0.22, 0.23, 0.22])
        monkeypatch.setattr(
            bench, "_run_cpu_probe", lambda iters=0, runs=0: next(probes)
        )
        monkeypatch.setattr(bench, "_bench_corpus_scale", lambda spark: {"stub": 1})
        monkeypatch.setattr(bench, "_bench_storage", lambda spark: {"stub": 2})

        class _Spark:
            class read:  # noqa: N801 — mimic spark.read.parquet(...).count()
                @staticmethod
                def parquet(path):
                    class _C:
                        @staticmethod
                        def count():
                            return 0

                    return _C()

        monkeypatch.setattr(bench, "get_spark", lambda **kw: _Spark())

        # main()'s _sweep times QUERIES[name].spark(...) through the noop
        # sink, so swapping QUERIES for no-op stand-ins exercises the real
        # sweep/sentinel/payload code with only the query cost removed
        class _Q:
            def __init__(self, t):
                self.t = t

            def spark(self, spark, sf_dir):
                class _W:
                    class write:  # noqa: N801
                        @staticmethod
                        def format(fmt):
                            class _M:
                                @staticmethod
                                def mode(m):
                                    class _S:
                                        @staticmethod
                                        def save():
                                            return None

                                    return _S()

                            return _M()

                return _W()

        monkeypatch.setattr(
            bench, "QUERIES", {n: _Q(t) for n, t in {**fake_q, **fake_d}.items()}
        )

        class _Cat:
            @staticmethod
            def clearCache():
                return None

        _Spark.catalog = _Cat()

        out = tmp_path / "bench_out.json"
        monkeypatch.setenv("BENCH_OUT", str(out))
        monkeypatch.setattr(bench, "N_RUNS", 1)
        monkeypatch.setattr(bench, "N_RUNS_ITERATIVE", 1)

        bench.main()

        payload = json.loads(out.read_text())
        # driver-required keys
        for key in ("metric", "value", "unit", "queries", "sf"):
            assert key in payload, key
        # r10 sentinel contract
        assert payload["loaded"] is False  # re-sweep ran idle
        s = payload["sentinel"]
        assert s["resweep"] is True
        assert s["samples_busy_cores"] == [4.0, 2.1, 0.03, 0.03]
        assert s["envelope_cores"] == bench.SENTINEL_ENVELOPE_CORES
        # r11: the CPU micro-probe readings ride along
        assert s["samples_probe_s"] == [0.21, 0.22, 0.23, 0.22]
        assert s["probe_envelope_s"] == bench.CPU_PROBE_ENVELOPE_S
        assert set(payload["queries"]) == set(fake_q)
        assert payload["corpus_scale"] == {"stub": 1}
        assert payload["storage"] == {"stub": 2}
