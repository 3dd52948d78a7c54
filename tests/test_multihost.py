"""Multi-process (>= 2 hosts) path: launch the real worker fleet.

SURVEY.md §2.5 north star — the reference has no parallelism of any kind;
the multi-host path is validated by 2 actual OS processes x 4 virtual CPU
devices joined via jax.distributed (gloo collectives as the DCN stand-in).
Each worker runs the sharded Davidson solver on a dense operator and on
the distributed-BSR operator (halo ppermute crossing the process
boundary) and asserts <= 1e-6 eigenvalue error; see
diaglib_tpu/parallel/mh_dryrun.py.
"""

from diaglib_tpu.parallel.mh_dryrun import launch


def test_multihost_two_processes():
    # launch() enforces its own 600 s per-worker timeout

    out = launch(num_processes=2, local_devices=4)
    assert out.count("MH_DRYRUN_OK") == 2, out
