"""scripts/tpu_run.py watchdog logic: wedge detection + retry + success
pass-through, with the timing window shrunk via env for fast CI."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNNER = os.path.join(REPO, "scripts", "tpu_run.py")


def _run(cmd, log, **env):
    e = dict(os.environ, **{k: str(v) for k, v in env.items()})
    return subprocess.run(
        [sys.executable, RUNNER, log] + cmd,
        env=e, capture_output=True, text=True, timeout=120,
    )


# children run with -S: this rig's sitecustomize imports the TPU plugin,
# burning enough CPU at startup to defeat the low-CPU wedge heuristic
def test_healthy_child_passes_through(tmp_path):
    log = str(tmp_path / "ok.log")
    p = _run(
        [sys.executable, "-S", "-c", "print('payload')"],
        log, MO_RETRIES=2, MO_WEDGE_WINDOW=30, MO_WEDGE_MIN_CPU=0,
    )
    assert p.returncode == 0, p.stderr
    with open(log) as f:
        assert "payload" in f.read()


def test_wedged_child_killed_and_retried(tmp_path):
    # a sleeping -S child burns ~no CPU: below MIN_CPU after WINDOW secs
    log = str(tmp_path / "wedge.log")
    p = _run(
        [sys.executable, "-S", "-c", "import time; time.sleep(300)"],
        log, MO_RETRIES=2, MO_WEDGE_WINDOW=1, MO_WEDGE_MIN_CPU=1,
    )
    assert p.returncode == 1
    assert "exhausted retries" in p.stderr
    with open(log) as f:
        text = f.read()
    assert text.count("WEDGED") == 2  # both attempts detected + killed


def test_failing_child_retries_then_gives_up(tmp_path):
    log = str(tmp_path / "fail.log")
    p = _run(
        [sys.executable, "-S", "-c", "import sys; sys.exit(3)"],
        log, MO_RETRIES=2, MO_WEDGE_WINDOW=30, MO_WEDGE_MIN_CPU=0,
    )
    assert p.returncode == 1
    with open(log) as f:
        assert f.read().count("attempt") >= 2
