"""Round-4 probe: FEAST window at nP=123 production settings + 50-step
RT trace, on the mixed-precision scan-over-nodes engine (VERDICT r3
task 1).

Production config: matrix-free no-ovvv sigma (gather plans + all-bra
block ladder), n_quad=8, n_trial=4, ls_conv_tol=1e-4, default
ls_max_iter.  The mixed engine (f32 Krylov in a lax.map-over-nodes
program + f64 iterative refinement) is compared against the round-3
all-f64 inhouse+ozaki path for both wall-clock and eigenvalues (task-1
bar: match to 1e-8).

Run: python -u benchmarks/probe_r4_feast.py > /tmp/probe_r4_feast.out 2>&1
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import pymes_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from pymes_tpu.models import ueg
from pymes_tpu.mean_field import hf
from pymes_tpu.solver import ccd
from pymes_tpu.solver.eom_ccsd import EOM_CCSD
from pymes_tpu.solver.feast_eom_ccsd import FEAST_EOM_CCSD
from pymes_tpu.solver.rt_eom_ccsd import RT_EOM_CCSD
from pymes_tpu.ops.ueg_ladder import build_block_ladder, build_ovvv_plans
from pymes_tpu.log import set_verbosity

set_verbosity(-1)
print("devices:", jax.devices(), flush=True)

NEED = ('klij', 'ijab', 'abij', 'iajb', 'iabj', 'aibj', 'aijb',
        'ijka', 'ijak', 'iajk')

CUT = int(os.environ.get("R4_CUT", 10))        # 10 -> nP=123
RT_CUT = int(os.environ.get("R4_RT_CUT", 5))   # 5 -> nP=57
RT_STEPS = int(os.environ.get("R4_RT_STEPS", 50))


def build(cutoff):
    u = ueg.UEG(14, 7, 7, 0.5)
    u.init_single_basis(cutoff)
    no, n_p = 7, u.n_spatial
    nv = n_p - no
    idx, vals = u.eval_2b_integrals(sp=2)
    d = ueg.sparse_to_blocks(idx, vals, n_p, no, names=NEED,
                             dtype=jnp.float64)
    kin = jnp.asarray(u.kinetic_energies())
    eps_i = hf.calcOccupiedOrbE(kin, d['klij'], no)
    eps_a = hf.calcVirtualOrbE(kin, d['aibj'], d['aijb'], no, nv)
    fock = jnp.diag(jnp.concatenate([eps_i, eps_a]))
    bp_all = build_block_ladder(u, bra="all")   # presliced int8 attached
    blocks = ccd.CCDBlocks(klij=d['klij'], ijab=d['ijab'], abij=d['abij'],
                           iajb=d['iajb'], iabj=d['iabj'], abcd=None,
                           ladder=bp_all)
    res = ccd.CCD(no).solve(fock, blocks, level_shift=-1.0, max_iter=60)
    T2 = jnp.asarray(res["t2 amp"])
    print(f"cutoff={cutoff} nP={n_p}: CCD e={res['ccd e']:.10f}",
          flush=True)
    # no-ovvv EOM operator dict (production matrix-free config)
    Vd = {k: d[k] for k in ('klij', 'ijab', 'abij', 'iajb', 'iabj',
                            'ijka', 'ijak', 'iajk')}
    Vd["abcd"] = None
    Vd["abcd_ladder"] = bp_all
    Vd["_ovvv_plans"] = build_ovvv_plans(u)
    return u, no, nv, fock, Vd, T2


t_all = time.time()
u, no, nv, fock, Vd, T2 = build(CUT)

# reference roots for the window (fused Davidson, ozaki sigma)
dav = EOM_CCSD(no, n_excit=2)
dav.max_iter = 300
dav.contract_mode = "ozaki:7:6"
t0 = time.time()
roots = np.sort(np.real(dav.solve(fock, Vd, T2)))
print(f"Davidson nP=123 no-ovvv: roots={roots} wall={time.time()-t0:.1f}s "
      f"iters={dav.n_iterations}", flush=True)
e_c = float(roots.mean())
e_r = float(np.ptp(roots) / 2 + 0.05)

# nP=123 window on the mixed engine.  Near-real-axis contour nodes are
# nearly singular shifted systems sitting in a DENSE part of the H̄
# spectrum (min diag 5.179, window ~[5.19, 5.33]): restarted GMRES with
# a small Krylov space stagnates — GMRES(20)x20 stalled at ~1e-1 rel
# (first r4 probe run), and restarting more doesn't help once stalled.
# The lever is the Krylov dimension: m=120 resolves the O(tens) of
# near-window modes in one cycle; the in-house GMRES early-exits
# converged nodes so the budget only costs on the stubborn near-axis
# nodes.  f32 basis at m=120 is (121, 660k)·4B ≈ 320 MB — fine in HBM.
s = FEAST_EOM_CCSD(no, e_c=e_c, e_r=e_r, n_trial=4, max_iter=3,
                   n_quad=8, seed=11, n_excit=2, ls_conv_tol=1e-4)
s.contract_mode = "ozaki:7:6"
s.ls_max_iter = 4
s.ls_restart = 120
for run in ("cold", "warm"):
    t0 = time.time()
    ev = np.sort(np.real(s.solve(fock, Vd, T2)))
    wall = time.time() - t0
    print(f"FEAST[mixed|{run}] nP=123: wall={wall:.1f}s ev={ev} "
          f"max_ls_res={np.max(s.last_ls_residuals):.2e}", flush=True)
inside = ev[(ev > e_c - e_r) & (ev < e_c + e_r)]
k = min(len(inside), 2)
print(f"FEAST nP=123: |mixed - davidson| = "
      f"{np.max(np.abs(np.sort(inside)[:k] - roots[:k])):.3e}", flush=True)

# mixed-vs-f64 equivalence at nP=57 (the size where the round-3 f64
# path is recorded converging; the vmapped f64 batch pays the worst
# node's Krylov count for every node, so the equivalence check lives
# at the cheaper size)
u1_, no1_, nv1_, fock1, Vd1, T2a = build(5)
dav1 = EOM_CCSD(no1_, n_excit=2)
dav1.max_iter = 300
dav1.contract_mode = "ozaki:7:6"
r1 = np.sort(np.real(dav1.solve(fock1, Vd1, T2a)))
e_c1, e_r1 = float(r1.mean()), float(np.ptp(r1) / 2 + 0.05)
evs = {}
for tag, prec in (("mixed", "mixed"), ("f64+ozaki", "f64")):
    s1 = FEAST_EOM_CCSD(no1_, e_c=e_c1, e_r=e_r1, n_trial=4, max_iter=3,
                        n_quad=8, seed=11, n_excit=2, ls_conv_tol=1e-4)
    s1.ls_precision = prec
    s1.contract_mode = "ozaki:7:6"
    s1.ls_max_iter = 40
    s1.ls_restart = 30
    for run in ("cold", "warm"):
        t0 = time.time()
        ev1 = np.sort(np.real(s1.solve(fock1, Vd1, T2a)))
        print(f"FEAST[{tag}|{run}] nP=57: wall={time.time()-t0:.1f}s "
              f"ev={ev1} max_ls_res={np.max(s1.last_ls_residuals):.2e}",
              flush=True)
    evs[tag] = ev1[(ev1 > e_c1 - e_r1) & (ev1 < e_c1 + e_r1)]
k = min(len(evs["mixed"]), len(evs["f64+ozaki"]))
dev = np.max(np.abs(evs["mixed"][:k] - evs["f64+ozaki"][:k])) if k \
    else np.inf
print(f"FEAST nP=57: |mixed - f64| = {dev:.3e} (task-1 bar: 1e-8)",
      flush=True)

# ---- RT trace: >= 50 steps at nP=57, per-step cost ----
u2_, no2_, nv2_, fock2, Vd2, T2b = build(RT_CUT)
rng = np.random.default_rng(4)
u1 = rng.standard_normal((nv2_, no2_))
u2v = rng.standard_normal((nv2_, nv2_, no2_, no2_)) * 0.01
r = RT_EOM_CCSD(no2_, e_c=float(np.mean(fock2.diagonal())), e_r=1.0,
                n_quad=16)
r.contract_mode = "ozaki:7:6"
r.ls_conv_tol = 1e-6
q1, q2 = np.asarray(u1, complex), np.asarray(u2v, complex)
autocorr = []
step_walls = []
for step in range(RT_STEPS):
    t0 = time.time()
    q1, q2 = r.solve(fock2, Vd2, T2b, dt=0.05, u_singles=q1, u_doubles=q2)
    step_walls.append(time.time() - t0)
    ov = (np.vdot(u1, q1) + np.vdot(u2v, q2))
    autocorr.append(ov)
    if step in (0, 1, 2) or (step + 1) % 10 == 0:
        print(f"RT step {step + 1}/{RT_STEPS}: wall={step_walls[-1]:.2f}s "
              f"max_ls_res={np.max(r.last_ls_residuals):.2e} "
              f"|C(t)|={abs(ov):.6f}", flush=True)
w = np.asarray(step_walls)
print(f"RT trace nP=57 n_quad=16 dt=0.05: {RT_STEPS} steps, "
      f"step1(cold)={w[0]:.1f}s, warm median={np.median(w[1:]):.2f}s, "
      f"warm min={w[1:].min():.2f}s, total={w.sum():.1f}s", flush=True)
print(f"PROBE R4 FEAST DONE total={time.time()-t_all:.0f}s", flush=True)
