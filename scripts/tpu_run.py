"""Watchdog runner for TPU scripts on the flaky remote backend.

The axon backend intermittently WEDGES a fresh process before its first
real device op completes (the process sits at ~0 CPU forever; other
processes may work fine).  This wrapper starts the target command,
watches its cumulative CPU time, and kills + retries (up to
MO_RETRIES, default 8) whenever the process looks wedged: < MIN_CPU
seconds of CPU after WINDOW seconds of wall.  Known-good processes
(compiling or running) burn CPU continuously and are left alone.

Usage: python scripts/tpu_run.py <logfile> <cmd...>
"""
import os
import subprocess
import sys
import time


def cpu_seconds(pid: int) -> float:
    try:
        with open(f"/proc/{pid}/stat") as f:
            parts = f.read().split()
        return (int(parts[13]) + int(parts[14])) / os.sysconf("SC_CLK_TCK")
    except (OSError, IndexError, ValueError):
        return -1.0


def main():
    log, cmd = sys.argv[1], sys.argv[2:]
    retries = int(os.environ.get("MO_RETRIES", "8"))
    window = float(os.environ.get("MO_WEDGE_WINDOW", "150"))
    min_cpu = float(os.environ.get("MO_WEDGE_MIN_CPU", "15"))
    for attempt in range(retries):
        with open(log, "ab") as lf:
            lf.write(f"=== tpu_run attempt {attempt} ===\n".encode())
            lf.flush()
            p = subprocess.Popen(cmd, stdout=lf, stderr=subprocess.STDOUT)
        t0 = time.time()
        wedged = False
        while True:
            rc = p.poll()
            if rc is not None:
                if rc == 0:
                    print(f"ok after {attempt + 1} attempt(s)")
                    return 0
                break  # real failure: retry (may have been mid-wedge kill)
            wall = time.time() - t0
            if wall > window and cpu_seconds(p.pid) < min_cpu:
                p.kill()
                p.wait()
                wedged = True
                break
            time.sleep(10)
        with open(log, "ab") as lf:
            lf.write(
                f"=== attempt {attempt} {'WEDGED' if wedged else 'failed'},"
                f" retrying ===\n".encode()
            )
        time.sleep(15)
    print("exhausted retries", file=sys.stderr)
    return 1


if __name__ == "__main__":
    sys.exit(main())
