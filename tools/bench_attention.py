"""Microbenchmark the attention primitive at the SDXL fused-phase shapes.

Shapes (batch N+1=4, bf16, dh=64):
  level 1 self-attn: BH = 4*10 = 40, S = 4096
  level 2 / mid self-attn: BH = 4*20 = 80, S = 1024

Prints ms/call and TFLOP/s for the current dispatch (flash on TPU) and the
XLA fused path, using a 30-call scan to amortize dispatch overhead.
"""

import time

import jax
import jax.numpy as jnp

from tweediemix_tpu.ops.attention import _xla_attention, attention


def _sync(x):
    # on the tunneled axon backend block_until_ready() returns before the
    # work completes; a host fetch is the only reliable barrier
    import numpy as np

    return np.asarray(jax.device_get(x.ravel()[0]))


def bench(fn, args, n_iter=30):
    @jax.jit
    def scan_fn(args):
        def body(c, _):
            q, k, v = c
            o = fn(q, k, v)
            # feed output back as the next query so iterations can't be DCE'd
            return (o, k, v), ()

        (q, _, _), _ = jax.lax.scan(body, args, None, length=n_iter)
        return q

    _sync(scan_fn(args))
    t0 = time.perf_counter()
    _sync(scan_fn(args))
    dt = (time.perf_counter() - t0) / n_iter
    return dt


def main():
    key = jax.random.PRNGKey(0)
    for bh, s in [(40, 4096), (80, 1024)]:
        q = jax.random.normal(key, (bh, s, 64), jnp.bfloat16)
        k = jax.random.normal(jax.random.fold_in(key, 1), (bh, s, 64), jnp.bfloat16)
        v = jax.random.normal(jax.random.fold_in(key, 2), (bh, s, 64), jnp.bfloat16)
        flops = 4 * bh * s * s * 64
        for name, fn in [
            ("dispatch", lambda q, k, v: attention(q, k, v)),
            ("xla", lambda q, k, v: _xla_attention(q, k, v, 64.0**-0.5)),
        ]:
            dt = bench(fn, (q, k, v))
            print(
                f"BH={bh} S={s} {name:9s}: {dt*1e3:7.3f} ms  "
                f"{flops/dt/1e12:6.1f} TFLOP/s"
            )


if __name__ == "__main__":
    main()
