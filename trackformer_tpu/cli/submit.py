"""Multi-host launcher.

Parity target: /root/reference/src/run_with_submitit.py — SLURM submission
with preemption requeue (:42-127). On TPU pods the runtime launches one
process per host; this entry point initializes `jax.distributed` (replacing
NCCL process groups, SURVEY.md §2.3), turns on auto-resume (the requeue
`checkpoint()` hook equivalent: training always resumes from the newest
checkpoint in output_dir), then enters the train CLI.

Usage:
  python -m trackformer_tpu.cli.submit with submit.num_hosts=4 ... \
      [train named configs and overrides]

Under SLURM, srun the same command; host topology is discovered from the
environment by jax.distributed.initialize().
"""
from __future__ import annotations

import os
import sys


def init_distributed() -> bool:
    """Initialize jax.distributed when launched multi-host; returns whether
    a multi-host context was detected (reference util/misc.py:421-444
    rank-discovery equivalent).

    Explicit COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID env vars take
    precedence (generic launchers, and the multi-host smoke test); SLURM and
    TPU-pod environments are auto-detected by jax.distributed itself.
    """
    import jax

    coord = os.environ.get("COORDINATOR_ADDRESS")
    multi_host = (
        coord
        or os.environ.get("SLURM_NTASKS", "1") not in ("", "1")
        or os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") > 0)
    if not multi_host:
        return False
    kwargs = {}
    if coord:
        kwargs = dict(coordinator_address=coord,
                      num_processes=int(os.environ["NUM_PROCESSES"]),
                      process_id=int(os.environ["PROCESS_ID"]))
    jax.distributed.initialize(**kwargs)
    print(f"jax.distributed initialized: process "
          f"{jax.process_index()}/{jax.process_count()}, "
          f"{jax.local_device_count()} local / "
          f"{jax.device_count()} global devices")
    return True


def main(argv=None):
    argv = list(argv or sys.argv[1:])
    # pull submit.* overrides out; the rest goes to the train CLI
    train_argv = [a for a in argv if not a.startswith("submit.")]

    init_distributed()

    # preemption resilience: always resume optimizer state if a checkpoint
    # exists in output_dir (run_with_submitit.py:53-67 equivalent)
    if not any(a.startswith("resume_optim") for a in train_argv):
        train_argv.append("resume_optim=true")

    from .train import main as train_main
    return train_main(train_argv)


if __name__ == "__main__":
    main()
