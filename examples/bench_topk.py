import sys, os.path as osp
sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
import mask_rcnn_tpu.ops.topk as T
from mask_rcnn_tpu.utils.profiling import time_fn

rng = np.random.RandomState(0)
for n, k, b in [(65520, 6000, 1), (65520, 12000, 2)]:
    s = jnp.asarray(rng.randn(b, n), jnp.float32)
    key = jax.vmap(T._float_to_ordered_uint32)(s)

    ref = jax.jit(jax.vmap(lambda x: jax.lax.top_k(x, k)))
    new = jax.jit(jax.vmap(lambda x: T.top_k_select(x, k)))
    d32 = jax.jit(jax.vmap(lambda x: T.kth_largest_key(x, k)))
    h8 = jax.jit(jax.vmap(lambda x: T.kth_largest_key_hist(x, k, 8)))
    h4 = jax.jit(jax.vmap(lambda x: T.kth_largest_key_hist(x, k, 4)))
    rv, ri = ref(s); nv, ni = new(s)
    assert (np.asarray(rv) == np.asarray(nv)).all()
    assert (np.asarray(d32(key)) == np.asarray(h8(key))).all()
    assert (np.asarray(d32(key)) == np.asarray(h4(key))).all()
    row = dict(
        topk=time_fn(ref, s, warmup=3, iters=30),
        select=time_fn(new, s, warmup=3, iters=30),
        descent32=time_fn(d32, key, warmup=3, iters=30),
        hist8=time_fn(h8, key, warmup=3, iters=30),
        hist4=time_fn(h4, key, warmup=3, iters=30),
    )
    print(f"n={n} k={k} b={b}: " + "  ".join(f"{m}={v:.2f}ms" for m, v in row.items()))
