"""Microbench: 1x1 conv (nn.Conv) vs channel dot (nn.Dense) fwd+bwd on TPU.

PERF_NOTES r1: expand/project 1x1 conv backward measured 3.5x its forward
(theory ~2x) — hypothesis: XLA's conv filter-grad path picks bad layouts for
1x1 kernels, while expressing the same op as a dot over the channel axis
gets plain matmul gradients. This measures both at B5's hot shapes.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/s2tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B = 32
# (H, Cin, Cout) B5 MBConv expand/project + head/classifier shapes at bs32/224
SHAPES = [
    (112, 144, 24),   # stage2 project
    (112, 24, 144),   # stage2 expand
    (56, 240, 40),    # stage3 project
    (28, 480, 80),
    (14, 1056, 176),
    (14, 176, 1056),
    (7, 512, 2048),   # head-ish
    (224, 32, 4),     # classifier
]


def timeit(fn, *args, n=30):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    results = []
    for h, cin, cout in SHAPES:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(B, h, h, cin)).astype(np.float32), jnp.bfloat16)
        wc = jnp.asarray(rng.normal(size=(1, 1, cin, cout)).astype(np.float32), jnp.bfloat16)
        wd = wc.reshape(cin, cout)

        def conv_loss(w, x):
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
            return (y * y).sum(dtype=jnp.float32)

        def dense_loss(w, x):
            y = jnp.einsum("bhwc,cd->bhwd", x, w)
            return (y * y).sum(dtype=jnp.float32)

        conv_g = jax.jit(jax.grad(conv_loss, argnums=(0, 1)))
        dense_g = jax.jit(jax.grad(dense_loss, argnums=(0, 1)))
        conv_f = jax.jit(conv_loss)
        dense_f = jax.jit(dense_loss)

        tcf = timeit(lambda: conv_f(wc, x))
        tdf = timeit(lambda: dense_f(wd, x))
        tcg = timeit(lambda: conv_g(wc, x))
        tdg = timeit(lambda: dense_g(wd, x))
        results.append((h, cin, cout, tcf, tdf, tcg, tdg))
        print(
            f"{h:4d}^2 {cin:5d}->{cout:5d}  conv fwd {tcf:7.3f}  dense fwd {tdf:7.3f}  "
            f"conv f+b {tcg:7.3f}  dense f+b {tdg:7.3f}  bwd speedup {tcg/tdg:5.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
