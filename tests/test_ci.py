"""CI gate: one command that builds every model, runs every DQ check, and
exits nonzero on any violation (reference: dbt build --warn-error,
.github/workflows/dbt-ci.yml:42)."""

from pyspark.sql import functions as F

from saas_analytics_pipeline_spark import ci


def test_ci_gate_green_on_testdata(spark, sf_dir, tmp_path):
    ok, lines = ci.run_gate(spark, sf_dir, str(tmp_path / "wh"))
    assert ok, "\n".join(lines)
    assert any(line.startswith("BUILD ok") for line in lines)
    # the injected lineitem dups must be DETECTED (not silently clean)
    assert any("detector dup_lineitem_pk" in line and "pass" in line
               for line in lines)


def test_ci_gate_red_when_check_fails(spark, sf_dir, tmp_path, monkeypatch):
    def broken_suite(spark_, sf):
        # a violation frame with rows == a failing dbt test
        return {"always_fails": spark_.range(3).where(F.col("id") >= 0)}

    monkeypatch.setattr(ci, "standard_suite", broken_suite)
    ok, lines = ci.run_gate(spark, sf_dir, str(tmp_path / "wh"))
    assert not ok
    assert any("FAIL always_fails: 3 violations" in line for line in lines)


def test_ci_gate_red_when_detector_silent(spark, sf_dir, tmp_path, monkeypatch):
    def silent_detectors(spark_, sf):
        return {"dup_lineitem_pk": spark_.range(1).where(F.col("id") < 0)}

    monkeypatch.setattr(ci, "known_dirty_suite", silent_detectors)
    ok, lines = ci.run_gate(spark, sf_dir, str(tmp_path / "wh"))
    assert not ok
    assert any("detector went silent" in line for line in lines)


def test_bench_headline_keys_exist():
    """bench.py's headline set must name real catalog keys — a rename
    that orphaned a bench key would crash the driver's per-round bench."""
    import bench
    from saas_analytics_pipeline_spark import qcatalog

    qcatalog.load_all()
    missing = [k for k in bench.HEADLINE if k not in qcatalog.QUERIES]
    assert not missing, missing


def test_window_priority_and_reverify_name_real_keys():
    from saas_analytics_pipeline_spark import qcatalog

    qcatalog.load_all()
    assert set(qcatalog.WINDOW_PRIORITY) <= set(qcatalog.QUERIES)
    assert set(qcatalog.REVERIFY) <= set(qcatalog.QUERIES)


def test_catalog_freeze_every_key_verified_or_windowed():
    """r05 freeze invariant: every registered key either has a green
    driver row or sits inside the 50-slot verification window — no key
    may be added without a window slot to certify it (verdict r4 #1)."""
    from saas_analytics_pipeline_spark import qcatalog

    qcatalog.load_all()
    verified = qcatalog.verified_keys()
    window = set(qcatalog.ordered_keys()[:50])
    stranded = [
        k for k in qcatalog.QUERIES
        if k not in verified and k not in window
    ]
    assert not stranded, (
        f"{len(stranded)} keys are neither driver-verified nor in the "
        f"verification window: {stranded}"
    )
