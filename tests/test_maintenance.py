"""Workspace maintenance utilities (ref cleanup_demo_data.py,
pipeline_batch.py _as_local_uri)."""

from pathlib import Path

from data_pipeline_example_spark import maintenance as m


def test_as_local_uri_prefixes_and_is_idempotent():
    assert m.as_local_uri("/data/out") == "file:///data/out"
    assert m.as_local_uri("file:///data/out") == "file:///data/out"


def test_perform_cleanup_clears_but_keeps_dirs(tmp_path):
    out = tmp_path / "data" / "output"
    out.mkdir(parents=True)
    (out / "part-0000.parquet").write_text("x")
    (out / "nested").mkdir()
    (out / "nested" / "f").write_text("y")
    ckpt_file = tmp_path / "checkpoints"  # a FILE squatting the dir name
    ckpt_file.write_text("stale")

    actions = {a[2] for a in m.perform_cleanup(tmp_path)}
    assert actions == {"cleared", "created"}
    assert out.is_dir() and not list(out.iterdir())  # emptied, kept
    assert (tmp_path / "checkpoints").is_dir()  # file replaced by dir
    assert (tmp_path / "spark-warehouse").is_dir()  # missing -> created


def test_perform_cleanup_dry_run_touches_nothing(tmp_path):
    out = tmp_path / "data" / "output"
    out.mkdir(parents=True)
    (out / "keep.txt").write_text("x")
    actions = m.perform_cleanup(tmp_path, dry_run=True)
    assert all(a[2] == "would-clear" for a in actions)
    assert (out / "keep.txt").exists()
    assert not (tmp_path / "checkpoints").exists()
