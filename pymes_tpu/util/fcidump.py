"""FCIDUMP reader/writer.

File-format compatible with the reference (``pymes/util/fcidump.py:8,59``):
a Fortran-namelist header (NORB/NELEC/MS2/ORBSYM/ISYM) followed by integral
lines ``value p r q s`` (chemists' file order; stored in physicists' order
``V[p,q,r,s] = <pq|rs>``).  For Hermitian dumps the 4 real-orbital symmetry
images are restored; for transcorrelated dumps only the particle-exchange
symmetry ``pqrs ↔ qpsr`` holds (TC Hamiltonians are non-Hermitian).

The line parsing is vectorized with numpy (the reference parses line-by-line
in Python); an optional C++ fast path lives in ``pymes_tpu._native``.
"""

import os

import numpy as np

from pymes_tpu.log import print_logging_info

try:  # optional native fast parser (csrc/io_native.cpp)
    from pymes_tpu import _native
except Exception:  # pragma: no cover - fallback exercised when lib missing
    _native = None


def _parse_header(reader):
    line = reader.readline().strip()
    while not ("/" in line or "end" in line.lower()):
        line += reader.readline().strip()
    header = {"norb": 0, "nelec": 0, "ms2": 0}
    for attr in line.replace("&FCI", "").split(","):
        if "=" not in attr:
            continue
        key, _, val = attr.partition("=")
        key = key.strip().lower()
        val = val.strip().rstrip(",")
        if key in header and val.lstrip("-").isdigit():
            header[key] = int(val)
    return header


def read(fcidump_file="FCIDUMP", is_tc=False):
    """Read integrals from an FCIDUMP file.

    Returns ``(n_elec, n_orb, e_core, epsilon_p, h_pq, V_pqrs)`` with
    ``V_pqrs`` in physicists' notation, matching the reference reader
    (``pymes/util/fcidump.py:59``).
    """
    if not os.path.exists(fcidump_file):
        raise FileNotFoundError(fcidump_file)

    print_logging_info("Reading " + fcidump_file + "...", level=1)
    print_logging_info("Using TC integrals: ", is_tc, level=2)

    with open(fcidump_file) as reader:
        header = _parse_header(reader)
        n_elec, n_orb = header["nelec"], header["norb"]
        body = reader.read()

    if _native is not None:
        vals, idx = _native.parse_integral_lines(body)
    else:
        rows = np.array(body.split(), dtype=object)
        rows = rows.reshape(-1, 5)
        vals = rows[:, 0].astype(np.float64)
        idx = rows[:, 1:].astype(np.int64)

    e_core = 0.0
    epsilon_p = np.zeros(n_orb)
    h_pq = np.zeros([n_orb, n_orb])
    V_pqrs = np.zeros([n_orb, n_orb, n_orb, n_orb])

    p, r, q, s = idx[:, 0], idx[:, 1], idx[:, 2], idx[:, 3]
    keep = np.abs(vals) >= 1e-19

    two_body = keep & (p != 0) & (q != 0) & (r != 0) & (s != 0)
    pi, qi, ri, si = p[two_body] - 1, q[two_body] - 1, r[two_body] - 1, s[two_body] - 1
    v = vals[two_body]
    if not is_tc:
        # real-orbital Hermitian dump: restore the 4 symmetry images written
        # by the reference reader (pqrs, rqps, rsps->..., see fcidump.py:141)
        V_pqrs[pi, qi, ri, si] = v
        V_pqrs[ri, qi, pi, si] = v
        V_pqrs[ri, si, pi, qi] = v
        V_pqrs[pi, si, ri, qi] = v
    else:
        # TC: only particle-exchange symmetry <pq|rs> = <qp|sr>
        V_pqrs[qi, pi, si, ri] = v
        V_pqrs[pi, qi, ri, si] = v

    core = (p == 0) & (q == 0) & (r == 0) & (s == 0)
    if np.any(core):
        e_core = float(vals[core][-1])

    orb_e = (p != 0) & (q == 0) & (r == 0) & (s == 0)
    epsilon_p[p[orb_e] - 1] = vals[orb_e]

    one_body = keep & (p != 0) & (r != 0) & (q == 0) & (s == 0)
    h_pq[r[one_body] - 1, p[one_body] - 1] = vals[one_body]
    h_pq[p[one_body] - 1, r[one_body] - 1] = vals[one_body]

    return n_elec, n_orb, e_core, epsilon_p, h_pq, V_pqrs


def write(integrals, h, no, e_nuc=0.0, ms2=1, orbsym=1, isym=1, dtype="r",
          file="FCIDUMP"):
    """Write integrals to an FCIDUMP file (dense-array-native rewrite of
    ``pymes/util/fcidump.py:8``, whose CTF ``read_all_nnz`` path is broken
    post-CTF-migration)."""
    n_p = integrals.shape[0]
    with open(file, "w") as f:
        f.write("&FCI\n")
        f.write(" NORB=%i,\n" % n_p)
        f.write(" NELEC=%i,\n" % (no * 2))
        f.write(" MS2=%i,\n" % ms2)
        f.write(" ORBSYM=" + str([orbsym] * n_p).strip("[]") + ",\n")
        f.write(" ISYM=%i,\n" % isym)
        f.write("/\n")

        pi, qi, ri, si = np.nonzero(integrals)
        v = integrals[pi, qi, ri, si]
        for n in range(len(v)):
            f.write("  " + str(v[n]) + "  " + str(pi[n] + 1) + "  "
                    + str(ri[n] + 1) + "  " + str(qi[n] + 1) + "  "
                    + str(si[n] + 1) + "\n")

        hi, hj = np.nonzero(np.abs(h) > 1e-10)
        for n in range(len(hi)):
            f.write("  " + str(h[hi[n], hj[n]]) + "  " + str(hi[n] + 1)
                    + "  " + str(hj[n] + 1) + "  0  0\n")
        f.write(str(e_nuc) + " 0  0  0  0")
