import sys; sys.path.insert(0,'/root/repo')
import functools
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import scripts.probe_r6 as p6

def rows_b3_interp(re, im, sign=-1, *, stage2='gauss', passes=3):
    rows, n = re.shape
    bt = 128
    n1, n2 = n // 128, 128
    kern = functools.partial(p6._kernel_b3, n=n, n1=n1, n2=n2, sign=sign,
                             scale=1.0, stage2=stage2, passes=passes)
    spec = pl.BlockSpec((bt, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern, grid=(pl.cdiv(rows, bt),),
        in_specs=[spec, spec], out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((rows, n), jnp.float32)] * 2,
        interpret=True,
    )(re, im)

rng = np.random.default_rng(0)
n, rows = 4096, 128
x = (rng.standard_normal((rows,n)) + 1j*rng.standard_normal((rows,n))).astype(np.complex64)
ref = np.fft.fft(x, axis=-1)
re = jnp.asarray(x.real); im = jnp.asarray(x.imag)
for stage2 in ('gauss','naive'):
    for passes in (3,4):
        r, i = rows_b3_interp(re, im, stage2=stage2, passes=passes)
        out = np.asarray(r) + 1j*np.asarray(i)
        rel = np.linalg.norm(out-ref)/np.linalg.norm(ref)
        print(f'{stage2} x{passes}: relL2={rel:.2e}')
