"""One-shot health check — run at the start of a round (or after any
refactor) to confirm the full driver contract is green:

    python tools/selfcheck.py          # tests + oracle sweep + bench smoke
    python tools/selfcheck.py --fast   # skip the bench smoke

Exits non-zero on the first failing stage.
"""

import json
import subprocess
import sys

REPO = "/root/repo"


def run(name: str, cmd: list[str], env: dict | None = None) -> str:
    print(f"[selfcheck] {name} ...", flush=True)
    r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True, env=env)
    if r.returncode != 0:
        print(f"[selfcheck] {name} FAILED\n--- stdout ---\n{r.stdout[-3000:]}"
              f"\n--- stderr ---\n{r.stderr[-3000:]}")
        sys.exit(1)
    return r.stdout


def main() -> None:
    import os

    out = run("pytest", [sys.executable, "-m", "pytest", "tests/", "-x", "-q"])
    print("  ", out.strip().splitlines()[-1])

    out = run("oracle sweep", [sys.executable, "tools/check_oracle.py"])
    tail = [ln for ln in out.splitlines() if ln.startswith("[") or "green" in ln]
    n_ok = sum(1 for ln in tail if ln.startswith("[OK"))
    n_ro = sum(1 for ln in tail if ln.startswith("[ROWS-ONLY"))
    assert "all green" in out, "oracle sweep not green"
    print(f"   {n_ok} oracle-paired OK, {n_ro} rows-only")

    if "--fast" not in sys.argv:
        env = dict(os.environ, GRAFT_SF_DIR="/root/testdata/sf0.001",
                   RAY_GRAFT_CPUS="4", BENCH_TRIALS="1", BENCH_SKIP_QUERIES="1")
        out = run("bench smoke", [sys.executable, "bench.py"], env=env)
        rec = json.loads(out.strip().splitlines()[-1])
        print(f"   bench: {rec['turns_per_sec']} turns/s at sf{rec['sf']}")

    print("[selfcheck] ALL GREEN")


if __name__ == "__main__":
    main()
