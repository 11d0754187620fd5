"""Bench-harness robustness: the round-2 driver bench crash was a shared
/dev/shm scratch root — one process's cleanup rmtree'd a CONCURRENT bench's
live store mid-write. The harness now mkdtemps a private scratch per process
and deletes only its own; this suite proves a dying sibling can no longer
take a running bench down with it."""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spawn_bench(args):
    return subprocess.Popen(
        [sys.executable, os.path.join(REPO, "bench.py"), *args],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=dict(os.environ, PYTHONPATH=REPO),
    )


@pytest.mark.slow
def test_concurrent_bench_pair_survives_sigkill():
    """Two tmpfs benches run concurrently; one is SIGKILLed mid-run (its
    atexit/finally cleanup never fires — worst case for shared state). The
    survivor must finish rc=0 with a parseable JSON line, and the victim's
    orphaned scratch dir must be the ONLY leftover (bounded leak, never a
    shared-root wipe)."""
    before = set(os.listdir("/dev/shm"))
    victim = _spawn_bench(["--parallelism", "2", "--spec", "default",
                           "--tmpfs"])
    survivor = _spawn_bench(["--parallelism", "4", "--spec", "default",
                             "--tmpfs"])
    try:
        # let both get past session startup and into staged writes
        time.sleep(75)
        assert victim.poll() is None, (
            "victim died early: " + victim.stderr.read()[-2000:])
        victim.send_signal(signal.SIGKILL)
        out, err = survivor.communicate(timeout=900)
        assert survivor.returncode == 0, err[-3000:]
        payload = json.loads(out.strip().splitlines()[-1])
        assert payload["scheduled"] > 0
        assert payload["tmpfs_scratch"] is True
    finally:
        for p in (victim, survivor):
            if p.poll() is None:
                p.kill()
        victim.communicate()
    # victim's private scratch may remain (it was killed); sweep it and
    # verify nothing else of ours leaked outside per-process dirs
    leaked = [d for d in set(os.listdir("/dev/shm")) - before
              if d.startswith("spark-graft-bench-")]
    import shutil
    for d in leaked:
        shutil.rmtree(os.path.join("/dev/shm", d), ignore_errors=True)
    assert len(leaked) <= 2  # victim's scratch (+ survivor's if mid-sweep)
