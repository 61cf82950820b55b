"""Virtual-mesh scaling measurement (BASELINE.md:31).

Real multi-chip hardware is unavailable here, and the virtual CPU mesh
timeshares the host's physical cores (2 on this machine), so a raw
t(1)/(N*t(N)) efficiency is a LOWER BOUND, not a hardware claim. What the
virtual mesh can measure honestly:

  1. the sharded path stays correct and t(N) does not blow up with N
     (no accidental serialization or replication), and
  2. the collective overhead share — the decode with an ordered
     all_gather of outputs vs without. Per-chip block work is independent
     (SURVEY.md §2: per-block state only), so on real ICI the scaling
     loss is exactly this gather term; its share here bounds the model
     scaling_efficiency >= 1 - collective_share.

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/scaling.py
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import jax

from snappy_tpu.core.constants import BLOCK_SIZE
from snappy_tpu.parallel import distributed
from snappy_tpu.ops import encode_xla


def corpus_blocks(n_blocks: int) -> np.ndarray:
    td = os.path.join(REPO, "testdata")
    names = ["alice29.txt", "html", "urls.10K", "geo.protodata"]
    raw = b"".join(open(os.path.join(td, n), "rb").read() for n in names)
    while len(raw) < n_blocks * BLOCK_SIZE:
        raw += raw
    return np.frombuffer(raw[: n_blocks * BLOCK_SIZE], np.uint8).reshape(n_blocks, BLOCK_SIZE)


def main() -> None:
    n_blocks = int(os.environ.get("SCALE_BLOCKS", "32"))
    blocks = corpus_blocks(n_blocks)
    buf = np.zeros((n_blocks, BLOCK_SIZE + encode_xla.ENC_PAD), np.uint8)
    buf[:, :BLOCK_SIZE] = blocks
    blens = np.full(n_blocks, BLOCK_SIZE, np.int32)

    devices = jax.devices()
    results = {}
    t1 = None
    for nd in (1, 2, 4, 8):
        if nd > len(devices):
            break
        mesh = distributed.mesh_1d(devices[:nd])
        out, olens = distributed.compress_blocks(buf, blens, mesh)
        out_np, olens_np = np.asarray(out), np.asarray(olens)
        comp = np.zeros((n_blocks, out_np.shape[1] + 64), np.uint8)
        comp[:, : out_np.shape[1]] = out_np
        ulens = np.full(n_blocks, BLOCK_SIZE, np.int32)

        def run():
            o, ok, _ = distributed.decompress_blocks(comp, olens_np, ulens, mesh, BLOCK_SIZE)
            jax.block_until_ready(o)
            return o, ok

        o, ok = run()  # warm + correctness
        assert bool(np.asarray(ok).all())
        assert np.asarray(o).reshape(n_blocks, BLOCK_SIZE).tobytes() == blocks.tobytes()
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        t = min(times)
        if nd == 1:
            t1 = t
        eff = t1 / (nd * t)
        results[str(nd)] = {"seconds": t, "gbps": n_blocks * BLOCK_SIZE / t / 1e9, "efficiency": eff}
        print(f"mesh={nd}: {t*1e3:8.2f} ms  {results[str(nd)]['gbps']:.3f} GB/s  eff={eff:.2f}", flush=True)

    # Collective overhead share at the widest mesh: with vs without the
    # ordered all_gather, in BOTH directions (decode-output gather and
    # encode-output gather), swept over block counts — the share is the
    # MODEL's scaling loss term (1 - share bounds model efficiency); the
    # word "model" stays attached because the virtual mesh timeshares 2
    # host cores and cannot measure real-ICI efficiency.
    nd = min(8, len(devices))
    mesh = distributed.mesh_1d(devices[:nd])
    sweep = {}
    for nb in (8, 32, 128):
        blk = corpus_blocks(nb)
        bufn = np.zeros((nb, BLOCK_SIZE + encode_xla.ENC_PAD), np.uint8)
        bufn[:, :BLOCK_SIZE] = blk
        blensn = np.full(nb, BLOCK_SIZE, np.int32)
        out, olens = distributed.compress_blocks(bufn, blensn, mesh)
        out_np, olens_np = np.asarray(out), np.asarray(olens)
        comp = np.zeros((nb, out_np.shape[1] + 64), np.uint8)
        comp[:, : out_np.shape[1]] = out_np
        ulens = np.full(nb, BLOCK_SIZE, np.int32)

        def run_dec(gather):
            o, ok, _ = distributed.decompress_blocks(
                comp, olens_np, ulens, mesh, BLOCK_SIZE, gather=gather
            )
            jax.block_until_ready(o)

        def run_enc(gather):
            o, ol = distributed.compress_blocks(bufn, blensn, mesh, gather=gather)
            jax.block_until_ready(o)

        entry = {}
        for name, fn in (("decode", run_dec), ("encode", run_enc)):
            # Interleave gather/no-gather ROUNDS so host-load drift hits
            # both variants equally (back-to-back min-of-5 measured
            # nogather *slower* than gather in 4/6 cells in round 4 —
            # drift, clamped to share 0). Share is computed from medians
            # of per-round minima and reported with its spread.
            fn(False)
            fn(True)
            rounds = {"nogather": [], "gather": []}
            for _ in range(10):
                for gather in (False, True):
                    ts = []
                    for _ in range(3):
                        t0 = time.perf_counter()
                        fn(gather)
                        ts.append(time.perf_counter() - t0)
                    rounds["gather" if gather else "nogather"].append(min(ts))
            med = {k: sorted(v)[len(v) // 2] for k, v in rounds.items()}
            spread = {
                k: (max(v) - min(v)) / med[k] for k, v in rounds.items()
            }
            share_raw = 1.0 - med["nogather"] / med["gather"]
            share = max(0.0, share_raw)
            entry[name] = {
                "nogather": med["nogather"],
                "gather": med["gather"],
                "rounds_spread": {k: round(s, 3) for k, s in spread.items()},
                "collective_share_raw": round(share_raw, 4),
                "collective_share": share,
                "model_scaling_efficiency": 1.0 - share,
            }
            print(
                f"blocks={nb:4d} {name}: collective share {share_raw:+.3f} -> "
                f"model efficiency {1-share:.3f} "
                f"(spread ng {spread['nogather']:.2f} / g {spread['gather']:.2f})",
                flush=True,
            )
        sweep[str(nb)] = entry

    # headline entry: the WORST (largest) share across the FULL table —
    # the model claim must hold for every cell, not the best one
    # (VERDICT r4 task 7)
    worst = max(e[d]["collective_share"] for e in sweep.values() for d in e)
    coll = {
        "collective_share": worst,
        "model_scaling_efficiency": 1.0 - worst,
        "basis": "max share across the full {blocks} x {decode,encode} sweep",
        "table_shares_raw": {
            f"{nb}/{d}": sweep[nb][d]["collective_share_raw"]
            for nb in sweep
            for d in sweep[nb]
        },
    }

    path = os.path.join(REPO, "benchmarks", "scaling_last.json")
    with open(path, "w") as f:
        json.dump(
            {"device_count": len(devices), "host_cores": os.cpu_count(), "blocks": n_blocks,
             "mesh": results, "collective": coll, "collective_sweep": sweep,
             "note": "virtual 8-device CPU mesh timesharing 2 host cores: raw mesh "
                     "efficiency is a timesharing artifact; collective_share is the "
                     "measured gather term and 1-share is a MODEL of ICI scaling "
                     "efficiency, not a hardware measurement"},
            f, indent=1,
        )
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
