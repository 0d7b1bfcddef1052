"""Anti-squat certification of the per-user scratch base (scratch.py):
a predictable default base owned by another uid, or left
group/other-writable, must FAIL loudly instead of silently sharing
state (ADVICE r08 — mode= is ignored by makedirs for existing dirs)."""

from __future__ import annotations

import os

import pytest

from saas_analytics_pipeline_spark import scratch


def test_scratch_path_creates_0700_base(tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SCRATCH", str(tmp_path / "fresh"))
    p = scratch.scratch_path("fam", "/root/testdata/sf0.001")
    base = str(tmp_path / "fresh")
    assert p.startswith(base)
    assert os.stat(base).st_uid == os.getuid()


def test_default_base_rejects_world_writable_squat(tmp_path, monkeypatch):
    """Simulate a squatted pre-creation: the default (predictable) base
    already exists world-writable. scratch_path must refuse it."""
    monkeypatch.delenv("SPARK_GRAFT_SCRATCH", raising=False)
    monkeypatch.setattr(
        "tempfile.gettempdir", lambda: str(tmp_path)
    )
    base = scratch.scratch_base()
    os.makedirs(base)
    os.chmod(base, 0o777)
    with pytest.raises(PermissionError, match="group/other-writable"):
        scratch.scratch_path("fam")
    # closing the hole makes the same call succeed
    os.chmod(base, 0o700)
    assert scratch.scratch_path("fam").startswith(base)


def test_explicit_env_base_checks_ownership_only(tmp_path, monkeypatch):
    """An operator-chosen SPARK_GRAFT_SCRATCH may legitimately be
    group-writable (shared deployments); only foreign ownership is
    refused there."""
    base = tmp_path / "shared"
    base.mkdir()
    os.chmod(base, 0o770)
    monkeypatch.setenv("SPARK_GRAFT_SCRATCH", str(base))
    assert scratch.scratch_path("fam").startswith(str(base))
