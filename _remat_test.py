import time, jax, jax.numpy as jnp, numpy as np
from u2mkd_tpu.data import synthetic, plumbing_host
from u2mkd_tpu.models import plumbing as P
from u2mkd_tpu.ops import losses
from u2mkd_tpu.train import optim
from u2mkd_tpu.utils.jaxinit import setup_compilation_cache
from u2mkd_tpu.ops.precision import set_compute_dtype
from __graft_entry__ import _teacher_model
import optax
setup_compilation_cache(); set_compute_dtype('bfloat16')

Pn, B = 32768, 1
caps = (Pn, Pn//2, Pn//4, Pn//8, Pn//16)
model = _teacher_model(num_classes=17, cr=1.0, voxel_size=0.05)
raw = synthetic.make_batch(np.random.RandomState(0), B, Pn, voxel_size=0.05)
batch = {k: jnp.asarray(v) for k,v in raw.items()}
pl_arr = plumbing_host.batch_plumbing(raw['pcoords'], raw['xyz'], raw['pmask'], caps)
batch['plumbing'] = {k: [jnp.asarray(a) for a in v] for k, v in pl_arr.items()}
tx = optim.make_optimizer('sgd_spformer', 0.02)

@jax.jit
def init_fn(batch, rng):
    pl = P.from_precomputed(batch['plumbing'], batch['pmask'])
    return model.init({'params': rng, 'dropout': jax.random.fold_in(rng,1)}, batch['feats'], pl, True)
var = init_fn(batch, jax.random.PRNGKey(0))
print('init ok', flush=True)
params = var['params']; bs0 = var['batch_stats']
opt_state = tx.init(params)

@jax.jit
def step(params, bs, opt_state, batch, rng):
    pl = P.from_precomputed(batch['plumbing'], batch['pmask'])
    valid = batch['pmask'] & batch['keyframe_mask'] & (batch['labels'] != 0)
    def fwd(params):
        out, mut = model.apply({'params': params, 'batch_stats': bs}, batch['feats'], pl, True, rngs={'dropout': rng}, mutable=['batch_stats'])
        return out['x_vox'], mut['batch_stats']
    fwd = jax.checkpoint(fwd)
    def loss_fn(params):
        logits, newbs = fwd(params)
        l = losses.lovasz_ce(logits.reshape(-1, 17), batch['labels'].reshape(-1), valid.reshape(-1))
        return l, newbs
    (l, newbs), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
    up, opt_state = tx.update(g, opt_state, params)
    return optax.apply_updates(params, up), newbs, opt_state, l

t0=time.time()
params, bs, opt_state, l = step(params, bs0, opt_state, batch, jax.random.PRNGKey(1))
jax.block_until_ready(l)
print(f'remat step ok: {time.time()-t0:.0f}s loss={float(l):.3f}', flush=True)
t0=time.time()
for _ in range(5): params, bs, opt_state, l = step(params, bs, opt_state, batch, jax.random.PRNGKey(2))
jax.block_until_ready(l)
print(f'{(time.time()-t0)/5*1e3:.0f}ms -> {B/((time.time()-t0)/5):.2f} scans/s', flush=True)
