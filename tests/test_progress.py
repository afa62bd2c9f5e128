"""Build progress tracker (build/progress.py; reference dnc/dnc.go:81-90)."""
import time

from vectorsearch_tpu.build.progress import BuildProgress, _scale_bucket


def test_idle_snapshot_is_none():
    t = BuildProgress()
    assert t.snapshot() is None


def test_phase_lifecycle_and_history():
    t = BuildProgress()
    t.begin(1_000_000, category=3)
    with t.phase("upload", "tiles"):
        snap = t.snapshot()
        assert snap["phase"] == "upload"
        assert snap["detail"] == "tiles"
        assert snap["category"] == 3
        assert snap["rows"] == 1_000_000
        assert snap["phase_elapsed_s"] >= 0
    with t.phase("lloyd"):
        pass
    snap = t.snapshot()
    assert [p["phase"] for p in snap["phases_done"]] == ["upload", "lloyd"]
    assert "phase" not in snap  # nothing currently open
    t.end()
    assert t.snapshot() is None


def test_eta_appears_on_second_build_of_same_scale():
    t = BuildProgress()
    t.begin(500_000)
    with t.phase("lloyd"):
        time.sleep(0.05)
    t.end()
    t.begin(600_000)  # same order of magnitude -> same EWMA bucket
    with t.phase("lloyd"):
        snap = t.snapshot()
        assert "phase_eta_s" in snap
        assert snap["phase_eta_s"] >= 0
    t.end()
    # different scale bucket: no ETA
    t.begin(5_000)
    with t.phase("lloyd"):
        assert "phase_eta_s" not in t.snapshot()
    t.end()


def test_nested_phases_are_noops():
    """The balance pass runs nested kmeans() sub-splits; their inner
    phases must not clobber the outer phase or pollute the EWMA."""
    t = BuildProgress()
    t.begin(1000)
    with t.phase("balance", "round 1"):
        with t.phase("lloyd"):  # nested: ignored
            assert t.snapshot()["phase"] == "balance"
        assert t.snapshot()["phase"] == "balance"  # inner exit kept it
    done = t.snapshot()["phases_done"]
    assert [p["phase"] for p in done] == ["balance"]
    t.end()


def test_phase_without_begin_still_tracks():
    """Direct kmeans() callers (bench, tools) never call begin()."""
    t = BuildProgress()
    with t.phase("superset"):
        assert t.snapshot()["phase"] == "superset"


def test_exception_inside_phase_still_closes_it():
    t = BuildProgress()
    t.begin(100)
    try:
        with t.phase("upload"):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    snap = t.snapshot()
    assert "phase" not in snap
    assert snap["phases_done"][0]["phase"] == "upload"
    t.end()


def test_scale_bucket():
    assert _scale_bucket(0) == 0
    assert _scale_bucket(1_000_000) == 6
    assert _scale_bucket(9_999_999) == 6
    assert _scale_bucket(10_000_000) == 7


def test_engine_stats_exposes_build_key():
    from vectorsearch_tpu.build.progress import tracker

    # module singleton is what the engine reads; idle -> None
    assert tracker.snapshot() is None or isinstance(
        tracker.snapshot(), dict
    )
