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


def test_scaling_campaign_resumes_and_survives_leg_failure(tmp_path):
    """Round-3 lesson: one crashed leg used to zero out the whole 2-hour
    campaign artifact. The campaign must (a) assemble its report from the
    legs that completed when one leg fails permanently in one rep,
    (b) persist every completed leg JSON as it finishes, and (c) resume
    from those JSONs without re-running them."""
    import bench

    calls = []
    fail_once = {"armed": True}

    def fake_leg(cli_args):
        calls.append(tuple(cli_args))
        # derive (kind, p) from the CLI shape the real runner uses
        if "--parallelism" in cli_args:
            p = int(cli_args[cli_args.index("--parallelism") + 1])
            kind = "e2e"
        else:
            p = int(cli_args[cli_args.index("--dedup-parallelism") + 1])
            kind = cli_args[cli_args.index("--dedup-stage") + 1] \
                if "--dedup-stage" in cli_args else "pipe"
        if kind == "canon" and p == 2 and fail_once["armed"]:
            fail_once["armed"] = False   # rep-0 canon2 dies; rep-1 covers it
            raise RuntimeError("injected leg crash")
        wall = 100.0 / p
        leg = {"parallelism": p, "wall_sec": wall,
               "urls_per_sec": round(1000 * p * 0.9, 1)}
        if kind == "e2e":
            leg.update(rounds=3, claimed=10, deduped_candidates=20,
                       scheduled=9, jobs_per_round=50.0)
        return leg

    fake_ceiling = lambda: {"ceiling_2_to_8": 1.0, "ceiling_8_to_32": 0.9}

    report = bench.run_scaling_campaign(
        repeats=2, leg_runner=fake_leg, leg_dir=str(tmp_path / "legs"),
        ceiling_fn=fake_ceiling)
    assert report["failed_legs"] == ["canon2_rep0"]
    assert report["pipeline_eff_2_to_8"] == 1.0
    assert report["canon_eff_2_to_8"] == 1.0      # rep-1 leg filled the hole
    n_first = len(calls)
    # every completed leg persisted
    legs_on_disk = [f for f in os.listdir(tmp_path / "legs")
                    if f.endswith(".json") and not f.startswith("_")]
    assert len(legs_on_disk) == n_first - 1       # all but the crashed one

    # resume: nothing re-runs, same report
    calls.clear()
    report2 = bench.run_scaling_campaign(
        repeats=2, leg_runner=fake_leg, leg_dir=str(tmp_path / "legs"),
        ceiling_fn=fake_ceiling)
    assert len(calls) == 1                        # only the failed leg re-ran
    assert report2["failed_legs"] == []
    assert report2["legs"] == report["legs"]


def test_assemble_only_merges_any_rep_indices(tmp_path):
    """assemble_scaling_report builds the report from whatever leg JSONs
    exist — heterogeneous rep indices included (the merge path for
    targeted quiet-window re-legs) — taking best-of per (kind, width)
    and running nothing."""
    sys.path.insert(0, REPO)
    import bench

    def leg(kind, p, rep, wall, rate):
        payload = {"parallelism": p, "wall_sec": wall, "urls_per_sec": rate}
        if kind == "pipe":
            payload["phase_sec"] = {"canon_probe_cache": wall * 0.8,
                                    "join_mint": wall * 0.2}
        if kind == "e2e":
            payload.update(rounds=2, claimed=10, deduped_candidates=20,
                           scheduled=9, jobs_per_round=5.0)
        (tmp_path / f"{kind}{p}_rep{rep}.json").write_text(
            json.dumps(payload))

    rates = {2: 100.0, 8: 380.0, 32: 900.0}
    for kind in ("e2e", "pipe", "canon", "probe"):
        for p, rate in rates.items():
            leg(kind, p, 0, 1000.0 / rate, rate)
    # a later targeted re-leg in a quiet window must win best-of
    leg("pipe", 8, 7, 1000.0 / 400.0, 400.0)
    (tmp_path / "_CAMPAIGN.json").write_text(json.dumps({"head": "h"}))

    fake_ceiling = lambda: {"ceiling_2_to_8": 1.0, "ceiling_8_to_32": 0.8}
    report = bench.assemble_scaling_report(
        leg_dir=str(tmp_path), ceiling_fn=fake_ceiling)
    assert report["pipeline_legs"]["8"]["urls_per_sec"] == 400.0
    assert report["pipeline_eff_2_to_8"] == 1.0   # (400/100)/4
    assert report["canon_eff_2_to_8"] == 0.95     # (380/100)/4
    assert report["campaign_head"] == "h"
    assert report["failed_legs"] == []
