"""Unit tests for bench.py's round-over-round prev recovery.

VERDICT r11 #2: the driver envelope truncates its ``tail`` capture to
2,000 chars; BENCH_r10.json's truncation cut the JSON line's head, so
``_prev_bench`` silently returned None and r11 shipped with no
normalized deltas in the round that most needed them.  These tests pin
the truncation-proof recovery order (self sidecar → envelope ``parsed``
→ envelope tail) and the explicit miss reason.

No Spark needed — pure filesystem logic via ``SPARK_GRAFT_BENCH_DIR``.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

import pytest

_BENCH_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")


@pytest.fixture()
def bench_mod():
    spec = importlib.util.spec_from_file_location("bench_under_test", _BENCH_PATH)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_under_test"] = mod
    spec.loader.exec_module(mod)
    yield mod
    sys.modules.pop("bench_under_test", None)


def _full_output(round_n: int) -> dict:
    return {
        "metric": "headline_queries_total_runtime",
        "value": 10.0 + round_n,
        "unit": "sec",
        "queries": {"q1": 1.0, "q2": 2.0},
        "sf": 0.1,
        "canary_sec": 0.1,
    }


@pytest.fixture()
def bench_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_BENCH_DIR", str(tmp_path))
    monkeypatch.delenv("SPARK_GRAFT_BENCH_ROUND", raising=False)
    return tmp_path


def test_truncated_tail_no_parsed_yields_explicit_reason(bench_mod, bench_dir):
    """The r10 failure mode: tail truncation cut the JSON head AND the
    driver's parse failed (parsed=None) — recovery must fail LOUDLY."""
    full_line = json.dumps(_full_output(10))
    (bench_dir / "BENCH_r10.json").write_text(
        json.dumps({"n": 10, "rc": 0, "tail": full_line[len(full_line) // 2 :], "parsed": None})
    )
    name, prev, reason = bench_mod._prev_bench()
    assert name is None and prev is None
    assert "truncation" in reason


def test_envelope_parsed_recovers_when_tail_truncated(bench_mod, bench_dir):
    """Driver-parsed full dict beats tail recovery (the r11→r12 path:
    BENCH_r11.json has parsed even though tail is capped at 2,000)."""
    out = _full_output(11)
    (bench_dir / "BENCH_r11.json").write_text(
        json.dumps({"n": 11, "rc": 0, "tail": "…truncated garbage…", "parsed": out})
    )
    name, prev, source = bench_mod._prev_bench()
    assert name == "BENCH_r11.json"
    assert source == "envelope_parsed"
    assert prev["queries"] == out["queries"]


def test_tail_recovery_still_works(bench_mod, bench_dir):
    out = _full_output(9)
    (bench_dir / "BENCH_r9.json").write_text(
        json.dumps({"n": 9, "rc": 0, "tail": "# noise\n" + json.dumps(out) + "\n", "parsed": None})
    )
    name, prev, source = bench_mod._prev_bench()
    assert name == "BENCH_r9.json"
    assert source == "envelope_tail"
    assert prev["canary_sec"] == 0.1


def test_self_sidecar_preferred_over_envelope(bench_mod, bench_dir):
    env_out = dict(_full_output(11), canary_sec=0.5)
    side_out = _full_output(11)
    (bench_dir / "BENCH_r11.json").write_text(
        json.dumps({"n": 11, "rc": 0, "tail": "", "parsed": env_out})
    )
    (bench_dir / "BENCH_SELF_r11.json").write_text(json.dumps(side_out))
    name, prev, source = bench_mod._prev_bench()
    assert name == "BENCH_SELF_r11.json"
    assert source == "self_sidecar"
    assert prev["canary_sec"] == 0.1


def test_newer_round_wins_and_current_round_excluded(bench_mod, bench_dir, monkeypatch):
    for n in (9, 10, 11):
        (bench_dir / f"BENCH_SELF_r{n}.json").write_text(json.dumps(_full_output(n)))
    # inferred current round = max(BENCH_r*)+1; no BENCH_r* here, so pin it
    monkeypatch.setenv("SPARK_GRAFT_BENCH_ROUND", "11")
    name, prev, _ = bench_mod._prev_bench()
    assert name == "BENCH_SELF_r10.json"
    assert prev["value"] == 20.0


def test_current_round_inferred_from_envelopes(bench_mod, bench_dir):
    """While round 12 runs, only envelopes ≤11 exist → inferred cur=12,
    so a same-session BENCH_SELF_r12.json (from an earlier re-run) is
    excluded from prev candidates."""
    (bench_dir / "BENCH_r11.json").write_text(
        json.dumps({"n": 11, "rc": 0, "tail": "", "parsed": _full_output(11)})
    )
    (bench_dir / "BENCH_SELF_r12.json").write_text(json.dumps(_full_output(12)))
    assert bench_mod._current_round() == 12
    name, prev, source = bench_mod._prev_bench()
    assert name == "BENCH_r11.json"
    assert source == "envelope_parsed"


def test_unreadable_sidecar_falls_back_to_envelope(bench_mod, bench_dir):
    (bench_dir / "BENCH_SELF_r11.json").write_text("{not json")
    (bench_dir / "BENCH_r11.json").write_text(
        json.dumps({"n": 11, "rc": 0, "tail": "", "parsed": _full_output(11)})
    )
    name, prev, source = bench_mod._prev_bench()
    assert source == "envelope_parsed"


def test_no_artifacts_reason(bench_mod, bench_dir):
    name, prev, reason = bench_mod._prev_bench()
    assert name is None and prev is None
    assert "no prior" in reason


def test_persist_self_round_trip(bench_mod, bench_dir, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_BENCH_ROUND", "12")
    out = _full_output(12)
    bench_mod._persist_self(out)
    on_disk = json.loads((bench_dir / "BENCH_SELF_r12.json").read_text())
    assert on_disk == out
    # and the NEXT round recovers it
    monkeypatch.setenv("SPARK_GRAFT_BENCH_ROUND", "13")
    name, prev, source = bench_mod._prev_bench()
    assert name == "BENCH_SELF_r12.json" and source == "self_sidecar"


def test_wrong_sf_sidecar_falls_through_to_envelope(bench_mod, bench_dir):
    """A dev-sf sidecar must not mask the same round's valid envelope:
    the sf filter runs INSIDE the recovery ladder (code-review r12)."""
    side = dict(_full_output(11), sf=0.01)  # dev run at the wrong sf
    (bench_dir / "BENCH_SELF_r11.json").write_text(json.dumps(side))
    (bench_dir / "BENCH_r11.json").write_text(
        json.dumps({"n": 11, "rc": 0, "tail": "", "parsed": _full_output(11)})
    )
    name, prev, source = bench_mod._prev_bench(sf=0.1)
    assert name == "BENCH_r11.json" and source == "envelope_parsed"
    assert prev["sf"] == 0.1


def test_wrong_sf_everywhere_reports_sf_in_reason(bench_mod, bench_dir, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_BENCH_ROUND", "12")
    (bench_dir / "BENCH_SELF_r11.json").write_text(
        json.dumps(dict(_full_output(11), sf=0.01))
    )
    name, prev, reason = bench_mod._prev_bench(sf=0.1)
    assert name is None and "sf=0.1" in reason


def test_sidecar_only_dir_infers_own_round_and_skips_self(bench_mod, bench_dir):
    """ADVICE r12: a dir with ONLY sidecars (dev machine, no envelopes,
    round unpinned) must not compare a run against its own earlier
    sidecar.  The inference labels the run with the newest sidecar's
    round (a re-run of it), so the n >= cur exclusion drops it."""
    (bench_dir / "BENCH_SELF_r11.json").write_text(json.dumps(_full_output(11)))
    assert bench_mod._current_round() == 11
    name, prev, reason = bench_mod._prev_bench(sf=0.1)
    assert name is None and "no prior" in reason
    # an OLDER sidecar is legitimately prior and is recovered
    (bench_dir / "BENCH_SELF_r10.json").write_text(json.dumps(_full_output(10)))
    assert bench_mod._current_round() == 11
    name, prev, source = bench_mod._prev_bench(sf=0.1)
    assert name == "BENCH_SELF_r10.json" and source == "self_sidecar"


def test_same_round_dev_sidecar_does_not_drift_inference(bench_mod, bench_dir):
    """A dev run that pre-wrote the current round's sidecar must not bump
    the driver's later inference to round+1 (which would let the dev
    sidecar masquerade as 'previous')."""
    (bench_dir / "BENCH_r12.json").write_text(
        json.dumps({"n": 12, "rc": 0, "tail": "", "parsed": _full_output(12)})
    )
    (bench_dir / "BENCH_SELF_r13.json").write_text(json.dumps(_full_output(13)))
    assert bench_mod._current_round() == 13
    name, prev, source = bench_mod._prev_bench(sf=0.1)
    assert name == "BENCH_r12.json" and source == "envelope_parsed"


def test_slim_for_stdout_fits_driver_tail(bench_mod):
    """VERDICT r12 #4: the driver envelope keeps only the LAST 2,000
    chars of stdout; the stdout line must fit or its head is cut and
    ``parsed`` lands null."""
    out = _full_output(12)
    # inflate with the real bulky fields a full run carries
    out["query_samples"] = {f"q{i}": [1.234, 2.345, 3.456] for i in range(40)}
    out["canary_samples_sec"] = {"start": [0.1] * 5, "end": [0.2] * 5}
    out["canary_parallel_samples_sec"] = {"start": [0.3] * 3, "end": [0.4] * 3}
    out["throughput_samples_sec"] = {f"t{i}": [5.0] * 5 for i in range(3)}
    out["normalized_delta_vs_prev"] = {f"q{i}": 0.1234 for i in range(40)}
    out["normalized_delta_vs_prev_parallel"] = {f"q{i}": 0.1234 for i in range(40)}
    # r17: per-batch streaming-state series is the bulkiest new field; its
    # compact max-rows twin must SURVIVE slimming (the bounded-state claim)
    out["streaming_state"] = {
        f"streaming_q{i}": {
            "result_rows": 100, "run_sec": 2.5, "n_batches": 8,
            "input_rows": 10_000, "max_state_rows": 500,
            "final_state_rows": 450, "state_rows_per_batch": [100] * 8,
            "final_watermark": "2024-01-20T09:26:49.777Z",
        }
        for i in range(5)
    }
    out["streaming_state_max_rows"] = {f"streaming_q{i}": 500 for i in range(5)}
    # inflate the always-kept surface to the real record's size (15 named
    # headliners + canaries/ratios/throughput/prev-bench scalars) so the
    # droppable keys alone cannot reach budget — forcing the
    # contended_window compaction step to fire, as in the real flagged run
    out["queries"] = {
        f"a_realistically_long_headline_query_name_{i:02d}": 1.234
        for i in range(15)
    }
    out.update(
        n_queries=15, startup_sec=9.876,
        canary_parallel_sec=0.8511, canary_sched_sec=0.9911,
        canary_ratio_vs_prev=1.4315, canary_parallel_ratio_vs_prev=1.2448,
        canary_sched_ratio_vs_prev=1.1875,
        streaming_interval_join_recs_per_sec=32123.4,
        kinesis_sim_scan_recs_per_sec=301234.5,
        kinesis_sim_sdk_scan_recs_per_sec=287654.3,
        r3_comparable_subset_total=8.765,
        prev_bench_file="BENCH_SELF_r16.json", prev_bench_source="self",
    )
    # r17: the contended-window annotation of a real flagged run (the
    # combination that actually measured 2,128 chars post-drop and would
    # have shipped parsed:null)
    out["contended_window"] = {
        "detected_at_start": True,
        "detected_at_end": True,
        "start_ratios": {"serial": 1.4315, "parallel": 1.2448, "sched": 1.1875},
        "end_ratios": {"serial": 1.8411, "parallel": 1.4916, "sched": 1.4623},
        "escalated_to_min5": [f"some_subsecond_headliner_{i}" for i in range(12)],
        "note": "canary(s) read >1.2x the previous round's — sub-second "
        "headline deltas carry at least the canary ratio as error bar",
    }
    labels = ("streaming_interval_join", "kinesis_sim_scan", "kinesis_sim_sdk_scan")
    for k in (
        "normalized_throughput_delta_vs_prev",
        "normalized_throughput_delta_vs_prev_parallel",
        "normalized_throughput_delta_vs_prev_sched",  # r14: third normalizer
    ):
        out[k] = {lbl: -0.1234 for lbl in labels}
    slim = bench_mod._slim_for_stdout(out)
    assert len(json.dumps(slim)) <= 2000
    # headline metrics always survive
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in slim
    # the bulky per-batch series is dropped FIRST; the compact twin stays
    assert "streaming_state" not in slim
    assert slim["streaming_state_max_rows"] == out["streaming_state_max_rows"]
    # the contention FLAG + ratios survive; the name list compacts to a count
    cw = slim["contended_window"]
    assert cw["detected_at_start"] and cw["start_ratios"]["serial"] == 1.4315
    assert "escalated_to_min5" not in cw and cw["n_escalated_to_min5"] == 12
    # a small record is passed through untouched
    small = _full_output(12)
    assert bench_mod._slim_for_stdout(small) == small


def test_pinned_headline_order_is_rotation_proof(bench_mod):
    """VERDICT r16 #1: the headline loop's execution order must be a
    constant across rounds — registry rotation reshuffling it is exactly
    what manufactured the duplicate_span_removal 'creep'.  Pinned names
    come out in PINNED_HEADLINE_ORDER no matter how the input dict is
    ordered; unpinned newcomers append at the tail without moving
    anyone."""
    pinned = bench_mod.PINNED_HEADLINE_ORDER
    # adversarial input order: reversed, plus a newcomer inserted first
    scrambled = {"brand_new_headliner": object()}
    for n in reversed(pinned):
        scrambled[n] = object()
    out = list(bench_mod._pinned_headline(scrambled))
    assert out == pinned + ["brand_new_headliner"]
    # subset (a headliner retired) keeps relative order of the rest
    subset = {n: object() for n in reversed(pinned[2:7])}
    assert list(bench_mod._pinned_headline(subset)) == pinned[2:7]


def test_sf_filter_skips_to_older_round(bench_mod, bench_dir, monkeypatch):
    """Round N-1 at the wrong sf → fall back to round N-2 at the right sf."""
    monkeypatch.setenv("SPARK_GRAFT_BENCH_ROUND", "12")
    (bench_dir / "BENCH_SELF_r11.json").write_text(
        json.dumps(dict(_full_output(11), sf=0.01))
    )
    (bench_dir / "BENCH_SELF_r10.json").write_text(json.dumps(_full_output(10)))
    name, prev, source = bench_mod._prev_bench(sf=0.1)
    assert name == "BENCH_SELF_r10.json" and prev["value"] == 20.0


def test_sched_normalized_throughput_deltas_emitted(bench_mod):
    """VERDICT r13 #4: BENCH_r14+ carries sched-canary-normalized
    throughput deltas alongside the serial and parallel normalizations.
    A sched canary running 2x FASTER than prev (ratio 0.5) halves the
    credited throughput gain; identical raw throughput then reads -0.5."""
    out = {
        "canary_sec": 1.0,
        "canary_parallel_sec": 2.0,
        "canary_sched_sec": 0.5,
        "streaming_interval_join_recs_per_sec": 30000.0,
        "kinesis_sim_scan_recs_per_sec": 300000.0,
        "kinesis_sim_sdk_scan_recs_per_sec": 330000.0,
    }
    prev = {
        "canary_sec": 1.0,
        "canary_parallel_sec": 2.0,
        "canary_sched_sec": 1.0,
        "queries": {"q1": 1.0},
        "streaming_interval_join_recs_per_sec": 30000.0,
        "kinesis_sim_scan_recs_per_sec": 300000.0,
        "kinesis_sim_sdk_scan_recs_per_sec": 330000.0,
    }
    bench_mod._attach_prev_deltas(out, {"q1": 1.0}, "BENCH_r13.json", prev, "envelope")
    assert out["canary_sched_ratio_vs_prev"] == 0.5
    sched = out["normalized_throughput_delta_vs_prev_sched"]
    assert set(sched) == {
        "streaming_interval_join",
        "kinesis_sim_scan",
        "kinesis_sim_sdk_scan",
    }
    assert all(v == -0.5 for v in sched.values())
    # the other two normalizations still present (ratios 1.0 -> delta 0)
    assert all(v == 0.0 for v in out["normalized_throughput_delta_vs_prev"].values())
    assert all(
        v == 0.0 for v in out["normalized_throughput_delta_vs_prev_parallel"].values()
    )


def test_sched_normalization_absent_when_prev_lacks_sched_canary(bench_mod):
    """Pre-r13 envelopes have no canary_sched_sec — the sched block must
    be skipped without error, other normalizations intact."""
    out = {
        "canary_sec": 1.0,
        "canary_parallel_sec": 2.0,
        "canary_sched_sec": 0.5,
        "streaming_interval_join_recs_per_sec": 30000.0,
        "kinesis_sim_scan_recs_per_sec": 300000.0,
        "kinesis_sim_sdk_scan_recs_per_sec": 330000.0,
    }
    prev = {
        "canary_sec": 1.0,
        "canary_parallel_sec": 2.0,
        "queries": {"q1": 1.0},
        "streaming_interval_join_recs_per_sec": 30000.0,
    }
    bench_mod._attach_prev_deltas(out, {"q1": 1.0}, "BENCH_r12.json", prev, "envelope")
    assert "canary_sched_ratio_vs_prev" not in out
    assert "normalized_throughput_delta_vs_prev_sched" not in out
    assert out["normalized_throughput_delta_vs_prev"] == {"streaming_interval_join": 0.0}


# ---------------------------------------------------------------------------
# contention gate (VERDICT r15 #2): canary-vs-prev ratios >1.2 escalate the
# prev artifact's sub-second headliners to min-of-5 and flag the artifact
# ---------------------------------------------------------------------------

def _prev_with_canaries() -> dict:
    return {
        # fast/mid sit under the 1.5 s escalation cutoff, slow above it;
        # edge pins the boundary exclusive (1.5 is NOT escalated)
        "queries": {"fast": 0.3, "slow": 2.5, "mid": 1.3, "edge": 1.5},
        "canary_sec": 0.2,
        "canary_parallel_sec": 1.0,
        "canary_sched_sec": 0.5,
    }


def test_contention_gate_clean_window_no_flag(bench_mod):
    flag, esc = bench_mod._contention_gate(
        _prev_with_canaries(), [0.21], [1.05], [0.55]
    )
    assert flag is None and esc == set()


def test_contention_gate_no_prev_no_flag(bench_mod):
    flag, esc = bench_mod._contention_gate(None, [0.5], [2.0], [1.0])
    assert flag is None and esc == set()


def test_contention_gate_one_hot_canary_trips_and_escalates_subsecond(bench_mod):
    # only the sched canary is dirty (the r12 signature) — still trips
    flag, esc = bench_mod._contention_gate(
        _prev_with_canaries(), [0.2], [1.0], [0.8]
    )
    assert flag is not None
    assert flag["start_ratios"]["sched"] == 1.6
    # escalation = prev artifact's headliners under the cutoff only
    # (boundary exclusive: 1.5 s itself stays at min-of-3)
    assert esc == {"fast", "mid"}


def test_contention_gate_exactly_at_threshold_is_clean(bench_mod):
    flag, esc = bench_mod._contention_gate(
        _prev_with_canaries(), [0.24], [1.2], [0.6]
    )
    assert flag is None and esc == set()


def test_contention_gate_missing_prev_canary_keys_skipped(bench_mod):
    # prev from the pre-parallel-canary era: only canary_sec present —
    # the gate must not KeyError, and must still trip on the serial ratio
    prev = {"queries": {"fast": 0.1}, "canary_sec": 0.2}
    flag, esc = bench_mod._contention_gate(prev, [0.5], [9.9], [9.9])
    assert flag is not None and set(flag["start_ratios"]) == {"serial"}
    assert esc == {"fast"}


def test_time_strides_era_grouping():
    """make_scaled_data --extend-time-axis (VERDICT r15 #4): datetime
    columns with overlapping ranges share ONE stride (cross-table time
    relationships survive); disjoint eras get their own (a global stride
    spanning the generator's 1995↔2024 era gap would overflow pandas'
    ns arithmetic by copy ~8)."""
    import importlib.util

    import pandas as pd

    path = os.path.join(os.path.dirname(_BENCH_PATH), "tools", "make_scaled_data.py")
    spec = importlib.util.spec_from_file_location("msd_under_test", path)
    msd = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(msd)

    ts = pd.to_datetime
    fact_dfs = {
        "orders": pd.DataFrame({"o_orderdate": [ts("1995-01-01"), ts("2001-08-01")]}),
        "lineitem": pd.DataFrame({"l_shipdate": [ts("1995-01-02"), ts("2001-11-04")]}),
        "events": pd.DataFrame({"ts": [ts("2024-01-01"), ts("2024-01-30 23:59:59")]}),
        "customer": pd.DataFrame({"c_custkey": [1, 2]}),  # no datetime col
    }
    strides = msd._time_strides(fact_dfs)
    assert set(strides) == {("orders", "o_orderdate"), ("lineitem", "l_shipdate"),
                            ("events", "ts")}
    # orders/lineitem overlap -> one shared stride covering BOTH ranges
    assert strides[("orders", "o_orderdate")] == strides[("lineitem", "l_shipdate")]
    assert strides[("orders", "o_orderdate")] == pd.Timedelta(days=(ts("2001-11-04") - ts("1995-01-01")).days + 2)
    # events is its own era with its own (1-month) stride
    assert strides[("events", "ts")] == pd.Timedelta(days=31)
    # 10 copies of the orders era stay ns-representable (the bug the
    # grouping fixes): max shift ~9 x 2500 days ~ 61 years < year 2262
    assert ts("2001-11-04") + 9 * strides[("orders", "o_orderdate")] < ts("2080-01-01")


def test_ab_bench_artifact_recovery_prefers_sidecar_and_checks_sf(tmp_path):
    """tools/ab_bench.py reads prior rounds' per-query timings for its
    attribution table: sidecar first (truncation-proof), then the driver
    envelope's parsed dict; wrong-sf candidates are skipped."""
    import importlib.util

    path = os.path.join(os.path.dirname(_BENCH_PATH), "tools", "ab_bench.py")
    spec = importlib.util.spec_from_file_location("ab_bench_under_test", path)
    ab = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ab)

    repo = str(tmp_path)
    # sidecar at the right sf wins
    (tmp_path / "BENCH_SELF_r13.json").write_text(
        json.dumps({"sf": 0.1, "queries": {"q": 1.0}})
    )
    (tmp_path / "BENCH_r13.json").write_text(
        json.dumps({"parsed": {"sf": 0.1, "queries": {"q": 9.0}}})
    )
    assert ab._artifact_queries(13, repo, 0.1) == {"q": 1.0}
    # wrong-sf sidecar falls through to the envelope's parsed dict
    (tmp_path / "BENCH_SELF_r14.json").write_text(
        json.dumps({"sf": 0.01, "queries": {"q": 5.0}})
    )
    (tmp_path / "BENCH_r14.json").write_text(
        json.dumps({"parsed": {"sf": 0.1, "queries": {"q": 2.0}}})
    )
    assert ab._artifact_queries(14, repo, 0.1) == {"q": 2.0}
    # nothing usable -> None (not a crash)
    assert ab._artifact_queries(99, repo, 0.1) is None
