"""bench.py smoke: the driver's headline artifact must never silently break.

Runs the real script in subprocesses (tiny fixture model, 64px, 2 NFE, CPU)
through the full AOT-sidecar lifecycle introduced for cold-session-proofing
(VERDICT r4 missing #3): cold run compiles and writes the sidecar, warm run
boots from it, a corrupted sidecar falls back to a fresh compile instead of
failing the bench.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(cache_dir: str) -> subprocess.CompletedProcess:
    env = dict(
        os.environ,
        BENCH_CPU="1", BENCH_MODEL="tiny_test", BENCH_BATCH="1",
        BENCH_NFE="2", BENCH_SIZE="64", BENCH_ALL="0", BENCH_ROUNDS="1",
        BENCH_AOT_CACHE=cache_dir,
    )
    # bench manages its own single-CPU backend; the suite's 8-virtual-device
    # flag would just slow the subprocess down
    env.pop("XLA_FLAGS", None)
    return subprocess.run([sys.executable, "bench.py"], capture_output=True,
                          text=True, env=env, cwd=REPO, timeout=900)


def _headline(proc: subprocess.CompletedProcess) -> dict:
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.strip().splitlines()
             if l.startswith("{")]
    assert lines, f"no JSON line in bench stdout: {proc.stdout!r}"
    row = json.loads(lines[-1])
    assert row["unit"] == "images/sec/chip"
    assert row["value"] > 0
    assert row["vs_baseline"] > 0
    return row


def test_bench_sidecar_lifecycle(tmp_path):
    cache = str(tmp_path / "aot")

    # 1. cold: compiles, writes the platform-tagged sidecar
    proc = _run_bench(cache)
    _headline(proc)
    assert "compiled + sidecar written" in proc.stderr
    sidecars = os.listdir(cache)
    assert len(sidecars) == 1 and sidecars[0].endswith("_s64.pkl")

    # 2. warm: boots from the sidecar (no compile)
    proc = _run_bench(cache)
    _headline(proc)
    assert "AOT sidecar" in proc.stderr and "written" not in proc.stderr

    # 3. stale/corrupt sidecar: must fall back to a fresh compile, not fail
    with open(os.path.join(cache, sidecars[0]), "wb") as f:
        f.write(b"not a pickle of an executable")
    proc = _run_bench(cache)
    _headline(proc)
    assert "ignoring stale AOT sidecar" in proc.stderr
    assert "compiled + sidecar written" in proc.stderr
