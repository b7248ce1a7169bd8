"""Probe T3: term-level breakdown of dressed_block("abij") at nP=219.

probe_r/probe_t put the T1-dressed abij build at ~29.5 ms (ozaki:7:6) —
the single largest piece of the mf-CCSD iteration after round 3's layout
fixes.  The builder expands 14 rank-1 Λ-transform terms (skip identity,
skip abcd); this probe times each term alone, plus the accumulated sum
with/without the out_perm transpose, to find whether the wall is the
ovvv gathers, the pairwise chains, or the padded-layout accumulation.

Run: python -u benchmarks/probe_t3_abij_terms.py > /tmp/probe_t3.out 2>&1
"""
import os
import sys
import time
import itertools as it

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import pymes_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from pymes_tpu.models import ueg
from pymes_tpu.solver import ccsd as ccsd_mod
from pymes_tpu.ops.ueg_ladder import build_ovvv_plans
from pymes_tpu.log import set_verbosity

set_verbosity(-1)
print("devices:", jax.devices(), flush=True)

NEED = ('klij', 'ijab', 'abij', 'iajb', 'iabj', 'aibj', 'aijb',
        'ijka', 'ijak', 'iajk')
cutoff = int(os.environ.get('T3_CUTOFF', 14))
MODE = os.environ.get('T3_MODE', 'ozaki:7:6')
u = ueg.UEG(14, 7, 7, 0.5)
u.init_single_basis(cutoff)
no, n_p = 7, u.n_spatial
nv = n_p - no
idx, vals = u.eval_2b_integrals(sp=2)
d = ueg.sparse_to_blocks(idx, vals, n_p, no, names=NEED, dtype=jnp.float64)
dict_V = {k: v for k, v in d.items()}
dict_V["_ovvv_plans"] = build_ovvv_plans(u)
print(f"nP={n_p} mode={MODE}", flush=True)

rng = np.random.default_rng(0)
T1 = jnp.asarray(rng.standard_normal((nv, no)) * 1e-3)
jax.block_until_ready(T1)


def timeit(tag, fn, n2=10):
    jfn = jax.jit(fn)
    out = jfn(T1)
    jax.block_until_ready(out)
    jax.block_until_ready(jfn(T1))
    t0 = time.time()
    for _ in range(n2):
        out = jfn(T1)
    jax.block_until_ready(out)
    print(f"{tag}: {(time.time()-t0)/n2*1e3:.2f} ms", flush=True)


# enumerate the 14 terms the same way dressed_block does: mask all but one
# combo via skip_sources is impossible (several combos share no source
# name), so reproduce the slot expansion here and call the internal chain
# through dressed_block with a one-term monkeypatched product
slots = []
for pos, c in enumerate("abij"):
    kind = "o" if c in ccsd_mod.OCC else "v"
    if pos < 2:
        slots.append(((("v", None), ("o", -1.0))) if kind == "v"
                     else ((("o", None),)))
    else:
        slots.append(((("o", None), ("v", 1.0))) if kind == "o"
                     else ((("v", None),)))

combos = [c for c in it.product(*slots)
          if not all(s is None for _, s in c)]          # skip identity
combos = [c for c in combos
          if "".join(k for k, _ in c) != "vvvv"]        # skip abcd source

orig_product = it.product


def one_term(combo):
    def fake_product(*args):
        # only intercept dressed_block's slot expansion — jax's own
        # tracing machinery calls itertools.product too
        if len(args) == 4 and tuple(args) == tuple(slots):
            return iter([combo])
        return orig_product(*args)
    def fn(t1):
        it.product = fake_product
        try:
            return ccsd_mod.dressed_block(
                "abij", dict_V, t1, skip_sources=("abcd",),
                contract_mode=MODE, out_perm=(2, 3, 0, 1),
                skip_identity=True)
        finally:
            it.product = orig_product
    return fn


for combo in combos:
    pat = "".join(k for k, _ in combo)
    dressed = "".join("D" if s is not None else "." for _, s in combo)
    timeit(f"term src={pat} dressed={dressed}", one_term(combo))

timeit("ALL terms + out_perm", lambda t1: ccsd_mod.dressed_block(
    "abij", dict_V, t1, skip_sources=("abcd",), contract_mode=MODE,
    out_perm=(2, 3, 0, 1), skip_identity=True))
timeit("ALL terms, NO out_perm", lambda t1: ccsd_mod.dressed_block(
    "abij", dict_V, t1, skip_sources=("abcd",), contract_mode=MODE,
    skip_identity=True))
print("PROBE T3 DONE", flush=True)
