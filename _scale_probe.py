import time, jax, jax.numpy as jnp, numpy as np
from u2mkd_tpu.data import synthetic, plumbing_host
from u2mkd_tpu.models import plumbing as P
from u2mkd_tpu.models.spvcnn import SPVCNN
from u2mkd_tpu.ops import losses
from u2mkd_tpu.utils.jaxinit import setup_compilation_cache
from u2mkd_tpu.ops.precision import set_compute_dtype
from __graft_entry__ import _teacher_model
setup_compilation_cache(); set_compute_dtype('bfloat16')

def timeit(f, *a, n=5):
    out = f(*a); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n): out = f(*a)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1e3

Pn, B = 32768, 1
caps = (Pn, Pn//2, Pn//4, Pn//8, Pn//16)
raw = synthetic.make_batch(np.random.RandomState(0), B, Pn, voxel_size=0.05)
batch = {k: jnp.asarray(v) for k, v in raw.items()}
pl_arr = plumbing_host.batch_plumbing(raw['pcoords'], raw['xyz'], raw['pmask'], caps)
batch['plumbing'] = {k: [jnp.asarray(a) for a in v] for k, v in pl_arr.items()}

# lovasz runtime at N=32768
lg = jnp.asarray(np.random.randn(Pn, 17).astype(np.float32))
lb = batch['labels'].reshape(-1); vm = batch['pmask'].reshape(-1)
f_lov = jax.jit(jax.grad(lambda x: losses.lovasz_softmax(x, lb, vm)))
print('lovasz fwd+bwd ms:', round(timeit(f_lov, lg), 1), flush=True)

# conv-only model fwd+bwd
conv_model = SPVCNN(num_classes=17, cr=1.0)
pl = P.from_precomputed(batch['plumbing'], batch['pmask'])
var = jax.jit(lambda b: conv_model.init({'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
    b['feats'], P.from_precomputed(b['plumbing'], b['pmask']), False))(batch)
def conv_loss(v, b):
    pl = P.from_precomputed(b['plumbing'], b['pmask'])
    return jnp.sum(conv_model.apply(v, b['feats'], pl, False)['x_vox']**2)
print('conv-only fwd+bwd ms:', round(timeit(jax.jit(jax.grad(conv_loss)), var, batch), 1), flush=True)

# teacher fwd+bwd (no opt, no remat)
model = _teacher_model(num_classes=17, cr=1.0, voxel_size=0.05)
var2 = jax.jit(lambda b: model.init({'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
    b['feats'], P.from_precomputed(b['plumbing'], b['pmask']), False))(batch)
def t_loss(v, b):
    pl = P.from_precomputed(b['plumbing'], b['pmask'])
    return jnp.sum(model.apply(v, b['feats'], pl, False)['x_vox']**2)
print('teacher fwd+bwd ms:', round(timeit(jax.jit(jax.grad(t_loss)), var2, batch), 1), flush=True)
