"""Worker for tests/test_multihost.py: one process of a 2-process CPU
process group. Compresses IN -> FRAME and decompresses FRAME -> OUT
through the multi-host drivers (disjoint per-process I/O + global mesh).

Usage: python multihost_worker.py <coordinator> <nprocs> <pid> <in> <frame> <out>
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    coord, nprocs, pid, in_path, frame_path, out_path = sys.argv[1:7]
    import jax

    jax.config.update("jax_platforms", "cpu")
    # initialize BEFORE importing snappy_tpu: its modules build jnp constant
    # tables at import time, which would initialise the XLA backend.
    jax.distributed.initialize(coord, int(nprocs), int(pid))
    from snappy_tpu.parallel import multihost
    assert jax.process_count() == int(nprocs), jax.process_count()
    mesh = multihost.global_mesh()
    assert mesh.devices.size == 2 * int(nprocs)

    multihost.compress_framed(in_path, frame_path, mesh=mesh)
    n = multihost.uncompress_framed(frame_path, out_path, mesh=mesh)
    print(f"proc {pid}: ok, {n} bytes", flush=True)


if __name__ == "__main__":
    main()
