"""Round-5 probe: close the nP=219 EOM row (VERDICT r4 task 2).

probe_r4_eom219 (this round's first run) showed the default pipeline
stays in the physical ~5.24 basin (MOM works — r3's untracked f64 run
diverged to −0.44) but hits max_iter=300 unconverged with the default
max_dim = 4·n_excit = 8: the two lowest roots are a ~2e-8-split
degenerate pair, and a subspace that restarts every (max_dim−n_excit)
iterations keeps discarding the slowly-separating partner direction.

This probe enlarges the retained subspace (max_dim=16) — the standard
Davidson fix for near-degenerate targets — and records the row:
roots, iterations, cold/warm walls, Γ-point consistency (EOM on
mf-CCSD amplitudes ≡ EOM on mf-CCD amplitudes at T1≡0).

Run: python -u benchmarks/probe_r5_eom219b.py > /tmp/probe_r5_eom219b.out 2>&1
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from _setup import build_ueg_mf
from pymes_tpu.solver import ccsd
from pymes_tpu.solver.eom_ccsd import EOM_CCSD
from pymes_tpu.log import set_verbosity

set_verbosity(-1)
print("devices:", jax.devices(), flush=True)

CUT = int(os.environ.get("R5_EOM_CUT", 14))
MAXDIM = int(os.environ.get("R5_EOM_MAXDIM", 16))
NEXCIT = int(os.environ.get("R5_EOM_NEXCIT", 2))

t_all = time.time()
s = build_ueg_mf(CUT, contract_mode="ozaki:7:6")
no, fock, Vd, T2_ccd = s["no"], s["fock"], s["Vd"], s["T2"]

# Γ-point mf-CCSD amplitudes (T1 converges to 0; energy equals CCD)
dmf = {k: s["d"][k] for k in ('klij', 'ijab', 'abij', 'iajb', 'iabj',
                              'aibj', 'aijb', 'ijka', 'ijak', 'iajk')}
dmf['_ovvv_plans'] = Vd['_ovvv_plans']
t0 = time.time()
res_ccsd = ccsd.CCSD(no).solve(fock, dmf, level_shift=-1.0, max_iter=60,
                               ladder=s["bp_all"], contract_mode="ozaki:7:6")
print(f"mf-CCSD: e={res_ccsd['ccsd e']:.10f} wall={time.time()-t0:.1f}s "
      f"|T1|max={float(jnp.max(jnp.abs(res_ccsd['t1']))):.1e} "
      f"|e-e_ccd|={abs(res_ccsd['ccsd e']-s['e_ccd']):.2e}", flush=True)

walls, roots = {}, {}
for tag, T2op in (("ccd-amps", T2_ccd),
                  ("ccsd-amps", jnp.asarray(res_ccsd["t2"]))):
    dav = EOM_CCSD(no, n_excit=NEXCIT)
    dav.max_iter = 300
    dav.max_dim = MAXDIM
    dav.contract_mode = "ozaki:7:6"
    t0 = time.time()
    ev = np.sort(np.real(dav.solve(fock, Vd, T2op)))
    cold = time.time() - t0
    it_cold = dav.n_iterations
    t0 = time.time()
    ev2 = np.sort(np.real(dav.solve(fock, Vd, T2op)))
    warm = time.time() - t0
    walls[tag] = (cold, warm)
    roots[tag] = ev2
    print(f"EOM[{tag}] nP={s['n_p']} max_dim={MAXDIM}: roots={ev2} "
          f"cold={cold:.1f}s warm={warm:.1f}s iters={dav.n_iterations} "
          f"(cold-run iters={it_cold})", flush=True)

dev = np.max(np.abs(roots["ccd-amps"] - roots["ccsd-amps"]))
print(f"Γ-point consistency |roots(CCD amps) − roots(CCSD amps)| "
      f"= {dev:.3e} (bar 1e-7)", flush=True)
print(f"PROBE R5 EOM219B DONE total={time.time()-t_all:.0f}s", flush=True)
