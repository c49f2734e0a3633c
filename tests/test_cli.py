"""CLI surface: python -m beats_ray with a YAML config."""

import glob
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_cli_run_and_resume(sf0001_dir, tmp_path):
    cfg = tmp_path / "pipe.yaml"
    cfg.write_text(
        "processors:\n"
        "  - dissect:\n"
        "      tokenizer: 'level=%{level} ts=%{ts} tool=%{tool} status=%{status} msg=\"%{msg}\"'\n"
        "      ignore_failure: true\n"
        "routes:\n"
        "  - name: errors\n"
        "    when:\n"
        "      regexp:\n"
        "        text: 'level=error'\n"
        "  - name: default\n"
    )
    # subprocess: the CLI owns its own ray session (separate from the
    # test session) — exactly how ray job submit runs it
    cmd = [
        sys.executable, "-m", "beats_ray",
        "--input", sf0001_dir + "/part-*.parquet",
        "--out", str(tmp_path / "out"),
        "--config", str(cfg),
        "--num-cpus", "2",
    ]
    env = {"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin",
           "HOME": "/root", "RAY_ADDRESS": "local"}
    r1 = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=300)
    assert r1.returncode == 0, r1.stderr[-2000:]
    m1 = json.loads(r1.stdout.strip().splitlines()[-1])
    assert m1["partitions_done"] == 8
    assert m1["rows_in"] == m1["rows_out"]
    assert set(m1["rows_routed"]) == {"errors", "default"}
    # resume over complete state: identical metrics, no rework
    r2 = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=300)
    m2 = json.loads(r2.stdout.strip().splitlines()[-1])
    drop = lambda d: {k: v for k, v in d.items() if k not in ("wall_s", "rows_per_sec")}
    assert drop(m2) == drop(m1)


def test_cli_bad_glob_errors():
    r = subprocess.run(
        [sys.executable, "-m", "beats_ray", "--input", "/nope/*.pq", "--out", "/tmp/x"],
        capture_output=True, text=True,
        env={"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin", "HOME": "/root"},
        timeout=60,
    )
    assert r.returncode == 2
    assert "no input files" in r.stderr


def test_cli_stream_mode(sf0001_dir, tmp_path):
    cmd = [
        sys.executable, "-m", "beats_ray",
        "--input", sf0001_dir + "/part-00000.parquet",
        "--out", str(tmp_path / "st"),
        "--num-cpus", "2",
        "--stream", "--window-s", "3600",
    ]
    env = {"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin",
           "HOME": "/root", "RAY_ADDRESS": "local"}
    r = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr[-1500:]
    m = json.loads(r.stdout.strip().splitlines()[-1])
    assert len(m["windows_done"]) >= 1
    assert sum(m["rows_routed"].values()) == 1791
