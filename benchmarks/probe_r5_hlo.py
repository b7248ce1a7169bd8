"""Round-5 probe: XLA program-size accounting for the bench solves
(VERDICT r4 task 4 — "count HLO ops per subgraph and report them").

Counts StableHLO ops in the lowered module (host-side, CPU lowering —
no TPU grant needed) for:
  * the nP=57 primary program (ccd_solve_jit, xla rings, block ladder)
  * its pieces: one ccd iteration body, diis.mix, ladder apply, energy
  * the nP=219 secondary program (ozaki:7:6)

Run: python -u benchmarks/probe_r5_hlo.py > /tmp/probe_r5_hlo.out 2>&1
"""
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from _setup import build_ueg_mf  # noqa: E402
from pymes_tpu.solver import ccd, mp2  # noqa: E402
from pymes_tpu.mixer import diis  # noqa: E402
from pymes_tpu.log import set_verbosity  # noqa: E402

set_verbosity(-1)


def count_ops(lowered):
    txt = lowered.as_text()
    ops = re.findall(r"= \"?([\w.]+)\"?[( ]", txt)
    from collections import Counter
    c = Counter(ops)
    return sum(c.values()), c


def report(name, fn, *args, **static):
    t0 = time.time()
    low = jax.jit(fn, **static).lower(*args)
    n, c = count_ops(low)
    top = ", ".join(f"{k}:{v}" for k, v in c.most_common(6))
    print(f"{name}: {n} stablehlo ops ({time.time()-t0:.1f}s lower) "
          f"[{top}]", flush=True)
    return n


for cutoff, mode in ((5, "xla"), (14, "ozaki:7:6")):
    s = build_ueg_mf(cutoff, solve_ccd=False)
    no, nv, fock, d = s["no"], s["nv"], s["fock"], s["d"]
    lad = s["bp_all"]
    from pymes_tpu.ops.ueg_ladder import build_block_ladder
    lad = build_block_ladder(s["u"])  # bra="vv" — the bench config
    blocks = ccd.CCDBlocks(klij=d['klij'], ijab=d['ijab'], abij=d['abij'],
                           iajb=d['iajb'], iabj=d['iabj'], abcd=None,
                           ladder=lad)
    eps = np.diag(np.asarray(fock))
    _, T0 = mp2.solve(jnp.asarray(eps[:no]), jnp.asarray(eps[no:]),
                      d['ijab'], d['abij'], -1.0)
    print(f"--- cutoff={cutoff} nP={s['n_p']} mode={mode} ---", flush=True)

    report(f"FULL ccd_solve_jit[{mode}]",
           lambda f, b, T: ccd.ccd_solve_jit(
               f, b, no, T, level_shift=-1.0, delta_e=1e-8, max_iter=60,
               contract_mode=mode, layout="ijab"),
           fock, blocks, T0)

    # pieces
    bij = ccd.blocks_ij_from(blocks)
    T0ij = jnp.transpose(T0, (2, 3, 0, 1))
    report(f"doubles_residual_ij[{mode}]",
           lambda fv, fo, T, b: ccd.doubles_residual_ij(
               fv, fo, T, b, contract_mode=mode),
           fock[no:, no:], fock[:no, :no], T0ij, bij)
    from pymes_tpu.ops.ueg_ladder import ladder_apply_ij
    report("block_ladder apply_ij",
           lambda T: ladder_apply_ij(lad, T), T0ij)
    st = diis.init_state(6, T0.size, jnp.float64)
    err = jnp.zeros((T0.size,))
    report("diis.mix", lambda s_, e, a: diis.mix(s_, e, a), st, err, err)
    report("ccd energy",
           lambda T, V, Vx: ccd.ccd_energy_ij(T, V, Vx),
           T0ij, d['ijab'], jnp.swapaxes(d['ijab'], 2, 3))
print("PROBE R5 HLO DONE", flush=True)
