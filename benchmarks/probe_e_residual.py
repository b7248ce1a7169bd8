"""Probe E: op-level breakdown of the nP=123 f64 CCD iteration.

Chain-timed (data-dependent fori_loop, scalar fetch); finds where the
~80 ms of non-ladder cost lives after the Ozaki ladder fix.

Run: python -u benchmarks/probe_e_residual.py > /tmp/probe_e.out 2>&1
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import pymes_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from pymes_tpu.models import ueg
from pymes_tpu.mean_field import hf
from pymes_tpu.solver import ccd, mp2
from pymes_tpu.mixer import diis
from pymes_tpu.ops import ozaki
from pymes_tpu.log import set_verbosity

set_verbosity(-1)
print("devices:", jax.devices(), flush=True)

NEED = ('klij', 'ijab', 'abij', 'iajb', 'iabj', 'abcd', 'aibj', 'aijb')
u = ueg.UEG(14, 7, 7, 0.5)
u.init_single_basis(10)
idx, vals = u.eval_2b_integrals(sp=2)
n_p, no = u.n_spatial, 7
nv = n_p - no
d = ueg.sparse_to_blocks(idx, vals, n_p, no, names=NEED, dtype=jnp.float64)
kin = jnp.asarray(u.kinetic_energies())
eps_i = hf.calcOccupiedOrbE(kin, d['klij'], no)
eps_a = hf.calcVirtualOrbE(kin, d['aibj'], d['aijb'], no, nv)
fock = jnp.diag(jnp.concatenate([eps_i, eps_a]))
blocks = ccd.blocks_from_dict(d)
_, T = mp2.solve(eps_i, eps_a, blocks.ijab, blocks.abij, -1.0)
jax.block_until_ready(T)
print(f"nP={n_p} blocks ready", flush=True)


def chain(make_body, args, n1=3, n2=9):
    @partial(jax.jit, static_argnums=(0,))
    def run(n, *a):
        def body(i, acc):
            return make_body(acc, *a)
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float64))

    float(run(n1, *args)); float(run(n2, *args))
    t0 = time.perf_counter(); float(run(n1, *args))
    t1 = time.perf_counter(); float(run(n2, *args))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n2 - n1)


def dep(acc, x):
    return x * (1.0 + acc * 1e-300)


# full residual, both modes (pre-sliced V shipped as an ARG — a closed-over
# 1.3 GB constant blows the remote-compile request body, HTTP 413)
for mode in ("xla", "ozaki:7:6"):
    if mode != "xla":
        pres = jax.jit(ozaki.slice_rows, static_argnums=1)(
            blocks.abcd.reshape(nv * nv, nv * nv), 7)
        jax.block_until_ready(pres[0])

        def body(acc, fock, blocks, T, sa, ea, mode=mode):
            R = ccd.doubles_residual(fock[no:, no:], fock[:no, :no],
                                     dep(acc, T), blocks,
                                     contract_mode=mode,
                                     abcd_presliced=(sa, ea))
            return acc + jnp.sum(R) * 1e-300

        t = chain(body, (fock, blocks, T, pres[0], pres[1]))
        del pres
    else:
        def body(acc, fock, blocks, T, mode=mode):
            R = ccd.doubles_residual(fock[no:, no:], fock[:no, :no],
                                     dep(acc, T), blocks,
                                     contract_mode=mode)
            return acc + jnp.sum(R) * 1e-300

        t = chain(body, (fock, blocks, T))
    print(f"residual[{mode}]   : {t*1e3:8.2f} ms", flush=True)

Vijab = blocks.ijab
Viajb = blocks.iajb
Viabj = blocks.iabj
Vklij = blocks.klij

specs = [
    ("klcd,cdij->klij", Vijab, T),
    ("klij,abkl->abij", Vklij, T),
    ("klcd,adkj->alcj", Vijab, T),
    ("klcd,dblj->cbkj", Vijab, T),
    ("acik,cbkj->abij", T, T),
    ("kaic,cbkj->abij", Viajb, T),
    ("acik,kbcj->abij", T, Viabj),
    ("adkl,lkdc->ac", T, Vijab),
    ("ac,cbij->abij", jnp.eye(nv, dtype=T.dtype), T),
    ("ki,abkj->abij", jnp.eye(no, dtype=T.dtype), T),
]
from pymes_tpu.ops.contract import contract
for mode in ("xla", "ozaki:7:6"):
    print(f"-- mode {mode}", flush=True)
    for spec, A, B in specs:
        def body(acc, A, B, spec=spec, mode=mode):
            out = contract(spec, A, dep(acc, B), mode=mode)
            return acc + jnp.sum(out) * 1e-300

        t = chain(body, (A, B))
        print(f"  {spec:20s}: {t*1e3:8.2f} ms", flush=True)

# elementwise pieces
def body_tilde(acc, T):
    Td = dep(acc, T)
    tilde = 2.0 * Td - jnp.einsum("baij->abij", Td)
    return acc + jnp.sum(tilde) * 1e-300

print(f"tilde_T           : {chain(body_tilde, (T,))*1e3:8.2f} ms",
      flush=True)


def body_perm(acc, T):
    Td = dep(acc, T)
    return acc + jnp.sum(Td + jnp.einsum("abij->baji", Td)) * 1e-300

print(f"P(ab,ij)          : {chain(body_perm, (T,))*1e3:8.2f} ms",
      flush=True)


D = (eps_i[None, None, :, None] + eps_i[None, None, None, :]
     - eps_a[:, None, None, None] - eps_a[None, :, None, None])


def body_jac(acc, T, D):
    return acc + jnp.sum(dep(acc, T) / (D - 1.0)) * 1e-300

print(f"jacobi divide     : {chain(body_jac, (T, D))*1e3:8.2f} ms",
      flush=True)

st = diis.init_state(6, nv * nv * no * no, T.dtype)


def body_diis(acc, st, T):
    Td = dep(acc, T)
    st2, mixed = diis.mix(st, Td.ravel(), Td.ravel())
    return acc + jnp.sum(mixed) * 1e-300

print(f"diis.mix          : {chain(body_diis, (st, T))*1e3:8.2f} ms",
      flush=True)


def body_e(acc, T, V):
    ed, ex = ccd.ccd_energy(dep(acc, T), V)
    return acc + (ed + ex) * 1e-300

print(f"energy            : {chain(body_e, (T, Vijab))*1e3:8.2f} ms",
      flush=True)

print("PROBE E DONE", flush=True)
