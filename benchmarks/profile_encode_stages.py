"""Fenced within-run decomposition of the Pallas encoder's stages.

Compiles the encoder at its debug modes (5 = pure take chain, 4 =
+extension, 2 = +contest, 0 = full) and times each with the calibrated
fence (bench.time_dispatch_stats) in ONE process, so the deltas between
modes are within-run and meaningful despite the chip's +/-15-30%
run-to-run variance. This is the harness behind the cost account in
ops/pallas_encode.py's docstring.

    python benchmarks/profile_encode_stages.py
"""

import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from bench import corpus_stream, time_dispatch_stats, BATCH
from snappy_tpu.core.constants import BLOCK_SIZE
from snappy_tpu.core.config import DEFAULT_MIN_PROFIT
from snappy_tpu.ops import pallas_encode as pe

raw = corpus_stream(BATCH * BLOCK_SIZE)
inp = np.frombuffer(raw, np.uint8)
buf0 = np.zeros((BATCH, BLOCK_SIZE + pe.ENC_PAD), np.uint8)
for b in range(BATCH):
    buf0[b, :BLOCK_SIZE] = inp[b*BLOCK_SIZE:(b+1)*BLOCK_SIZE]
dbuf = jax.device_put(buf0)
dlens = jax.device_put(np.full(BATCH, BLOCK_SIZE, np.int32))

def meas(label, mode, unroll):
    f = jax.jit(pe._build(BLOCK_SIZE, False, DEFAULT_MIN_PROFIT, mode, unroll))
    t0=time.time(); out = f(dbuf, dlens); meta=np.asarray(out[1]); t1=time.time()
    st = time_dispatch_stats(f, (dbuf, dlens), iters=5)
    print(f"{label:30s} min {st['min']*1e3:7.1f} ms  med {st['median']*1e3:7.1f}  spread {st['spread']:.2f}  (compile {t1-t0:.0f}s, meta0={int(meta[0])})", flush=True)
    return st['min']

t5  = meas("m5 pure chain U=4", 5, 4)
t51 = meas("m5 pure chain U=1", 5, 1)
t4  = meas("m4 +extension U=4", 4, 4)
t2  = meas("m2 +contest U=4", 2, 4)
t21 = meas("m2 +contest U=1", 2, 1)
t0f = meas("m0 full U=4", 0, 4)
print("DONE", flush=True)
