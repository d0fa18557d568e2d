"""Multi-host smoke test: 2 real processes on CPU with
`jax.distributed.initialize` (VERDICT item 8; reference counterpart:
run_with_submitit.py:83-127 + util/misc.py:421-444).

Launches tests/multihost_worker.py twice (2 virtual devices each -> a
4-device global mesh) and asserts: rank discovery via the production
`cli.submit.init_distributed`, variable-size object allgather, COCO-eval
prediction merge, and one sharded detection train step whose psum'd
loss/grad-norm agree bit-for-bit across processes.
"""
import os
import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).parent.parent


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch_workers():
    port = _free_port()
    env_base = dict(os.environ)
    env_base["JAX_PLATFORMS"] = "cpu"
    env_base["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    # repo only — omit the axon sitecustomize dir so the TPU plugin
    # never registers in the workers
    env_base["PYTHONPATH"] = str(REPO)
    env_base["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache"
    env_base["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1"
    env_base["COORDINATOR_ADDRESS"] = f"localhost:{port}"
    env_base["NUM_PROCESSES"] = "2"

    # write worker output to files, NOT pipes: a full pipe blocks a worker
    # mid-run while the other waits at the jax.distributed shutdown barrier
    procs, logs = [], []
    for pid in range(2):
        env = dict(env_base, PROCESS_ID=str(pid))
        log = open(f"/tmp/mh_worker{pid}.log", "w")
        logs.append(log)
        procs.append(subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "multihost_worker.py")],
            env=env, cwd=str(REPO), stdout=log, stderr=subprocess.STDOUT))
    outs = []
    for pid, p in enumerate(procs):
        # generous: cold-cache CPU compiles under full-machine load have
        # been observed to take >10 min; the retry in the test covers
        # aborts, not slowness
        try:
            p.wait(timeout=1500)
        except subprocess.TimeoutExpired:
            for q in procs:  # kill BOTH so the retry starts clean
                if q.poll() is None:
                    q.kill()
                    q.wait()
        logs[pid].close()
        outs.append(Path(f"/tmp/mh_worker{pid}.log").read_text())
    return procs, outs


def test_two_process_distributed():
    # the cross-process collectives can abort when a CPU-starved worker
    # misses a rendezvous window (seen under full-suite load); one retry on
    # a fresh port keeps the check meaningful without being flaky
    for attempt in range(2):
        procs, outs = _launch_workers()
        if all(p.returncode == 0 for p in procs) or attempt == 1:
            break
    for pid, (p, out) in enumerate(zip(procs, outs)):
        # a worker that completed every functional check can still die in
        # the post-"done" teardown race (rank 0's coordination service
        # closes while this worker's error-poll thread is alive; it
        # fatal-aborts with "detected fatal errors").  That is environment
        # noise, not a collective failure — all OK markers and the
        # bit-identical psum metrics below are the real signal.
        teardown_race = ("detected fatal errors" in out
                         and f"[{pid}] train_step OK" in out)
        assert p.returncode == 0 or teardown_race, \
            f"worker {pid} failed:\n{out}"
        assert f"[{pid}] allgather_objects OK" in out
        assert f"[{pid}] coco_eval merge OK" in out
        assert f"[{pid}] train_step OK" in out

    # the psum'd loss and grad norm must be identical on both processes
    def metrics(out):
        line = [ln for ln in out.splitlines() if "train_step OK" in ln][0]
        return line.split("OK")[1].strip()

    assert metrics(outs[0]) == metrics(outs[1]), (outs[0], outs[1])
