"""INDEPENDENT Reissner-Mindlin shell implementation for cross-validation.

This is the repo's substitute for the round-1 VERDICT's "dolfinx golden
nodal fields" item: dolfinx/FEniCSx is not installed in this environment, so
instead of stored golden files we cross-validate against a second, fully
independent implementation of the same discretization, written from the
mathematical definition with plain numpy + scipy sparse loops. It imports
NOTHING from femo_alpha_tpu — no shared element tables, no shared assembly,
no shared solver. On affine (rectangular) cells every energy integrand is a
polynomial integrated exactly by both quadratures, so the two Galerkin
solutions must agree at every node to solver tolerance (~1e-10): any
tabulation/assembly/BC/solver bug in the library breaks the match.

Discretization replicated (the library's spec, which itself mirrors the
reference's linear_shell_model.py:192-348):
  mixed CG2(vec3) x CG1(vec3) on quads, flat plate z=0, uhat=0, MID plane
  energy = 1/2 ∫ e_v'A e_v + k_v'D k_v dx   (membrane+bending, A=hC, D=h^3C/12)
         + 1/2 ∫ g'(kGh I) g dx             (shear, k=0.833)
         + 1/2 ∫ E h^3 [skew(grad u) + th.e_z]^2 / h_cell^2 dx  (drilling)
         - ∫ f . u dx                       (CG1 nodal load)
  strains: e = sym(grad_xy u_xy); kappa = sym([ -d th_y/dx_j ; d th_x/dx_j ]);
  gamma_i = (th_y + du_z/dx, -th_x + du_z/dy); h_cell = max vertex distance.
"""

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

SHEAR_K = 0.833
GAUSS_PTS = np.array([0.5 - np.sqrt(0.15), 0.5, 0.5 + np.sqrt(0.15)])
GAUSS_WTS = np.array([5.0, 8.0, 5.0]) / 18.0


def _lag2(t):
    """1D quadratic Lagrange at nodes {0, 1/2, 1}: values + derivatives."""
    v = np.array([(2 * t - 1) * (t - 1), 4 * t * (1 - t), t * (2 * t - 1)])
    d = np.array([4 * t - 3, 4 - 8 * t, 4 * t - 1])
    return v, d


def _lag1(t):
    return np.array([1 - t, t]), np.array([-1.0, 1.0])


class Q2Space:
    """Scalar continuous biquadratic space on a quad mesh (own numbering:
    vertices, then edges, then cell centers)."""

    def __init__(self, coords, conn):
        self.coords = coords
        self.conn = conn
        nn = len(coords)
        nc = len(conn)
        edges = {}
        cell_edges = np.zeros((nc, 4), dtype=int)
        # local edges in conn order v0-v1-v2-v3 (CCW): (0,1),(1,2),(2,3),(3,0)
        for c, cell in enumerate(conn):
            for le, (a, b) in enumerate([(0, 1), (1, 2), (2, 3), (3, 0)]):
                key = (min(cell[a], cell[b]), max(cell[a], cell[b]))
                if key not in edges:
                    edges[key] = len(edges)
                cell_edges[c, le] = edges[key]
        ne = len(edges)
        self.n_dofs = nn + ne + nc
        # per-cell dof ids in the 3x3 tensor layout (a, b) in {0,.5,1}^2:
        # index (i,j) with i = a-index, j = b-index; vertex map:
        # (0,0)=v0, (2,0)=v1, (2,2)=v2, (0,2)=v3
        self.cell_dofs = np.zeros((nc, 9), dtype=int)
        for c, cell in enumerate(conn):
            e = cell_edges[c]
            grid = {
                (0, 0): cell[0], (2, 0): cell[1], (2, 2): cell[2],
                (0, 2): cell[3],
                (1, 0): nn + e[0], (2, 1): nn + e[1], (1, 2): nn + e[2],
                (0, 1): nn + e[3],
                (1, 1): nn + ne + c,
            }
            self.cell_dofs[c] = [grid[(i, j)] for i in range(3)
                                 for j in range(3)]
        # dof coordinates (for BC location): vertex / edge-mid / center
        dof_xy = np.zeros((self.n_dofs, 2))
        dof_xy[:nn] = coords[:, :2]
        for (a, b), eid in edges.items():
            dof_xy[nn + eid] = 0.5 * (coords[a, :2] + coords[b, :2])
        for c, cell in enumerate(conn):
            dof_xy[nn + ne + c] = coords[cell, :2].mean(axis=0)
        self.dof_xy = dof_xy

    @staticmethod
    def tab(a, b):
        """Basis values/derivs at ref point (a, b) in the (i, j) layout."""
        va, da = _lag2(a)
        vb, db = _lag2(b)
        phi = np.outer(va, vb).ravel()
        dphi = np.stack([np.outer(da, vb).ravel(),
                         np.outer(va, db).ravel()], axis=1)
        return phi, dphi  # (9,), (9, 2)


def _q1_tab(a, b):
    """Q1 basis at (a, b) in conn order v0(0,0) v1(1,0) v2(1,1) v3(0,1)."""
    va, da = _lag1(a)
    vb, db = _lag1(b)
    order = [(0, 0), (1, 0), (1, 1), (0, 1)]
    phi = np.array([va[i] * vb[j] for i, j in order])
    dphi = np.array([[da[i] * vb[j], va[i] * db[j]] for i, j in order])
    return phi, dphi  # (4,), (4, 2)


def _plane_stress(E, nu):
    f = E / (1.0 - nu * nu)
    return np.array([[f, f * nu, 0.0], [f * nu, f, 0.0],
                     [0.0, 0.0, 0.5 * f * (1.0 - nu)]])


def assemble_rm_plate(coords, conn, thickness, E, nu, f_nodal, rho=None):
    """Assemble the clamped RM plate operators. Returns a dict with the
    stiffness K (csr), load F, the Q2 space, and — when rho is given — the
    shell mass matrix M of the inertia density
    rho*h*(|u|^2 + h_cell^2 |theta|^2)/2 (rotational inertia scaled by the
    mesh-size-squared drilling stabilization, as the library's
    inertia_form / the reference's inertialResidual).

    thickness/E/nu: per-cell (DG0) arrays; f_nodal: (nn, 3) CG1 load."""
    coords = np.asarray(coords, dtype=np.float64)
    conn = np.asarray(conn, dtype=int)
    nn, nc = len(coords), len(conn)
    sq = Q2Space(coords, conn)
    nQ2, nQ1 = sq.n_dofs, nn
    n_total = 3 * nQ2 + 3 * nQ1

    # quadrature on [0,1]^2 (3x3 GL: exact to per-axis degree 5 — covers all
    # integrands on affine cells)
    qpts = [(a, b, wa * wb) for a, wa in zip(GAUSS_PTS, GAUSS_WTS)
            for b, wb in zip(GAUSS_PTS, GAUSS_WTS)]

    rows, cols, vals = [], [], []
    mvals = [] if rho is not None else None
    F = np.zeros(n_total)
    for c in range(nc):
        xy = coords[conn[c], :2]
        hc = np.sqrt(max(
            np.sum((coords[conn[c]][i] - coords[conn[c]][j]) ** 2)
            for i in range(4) for j in range(4)))
        h, Ec, nuc = thickness[c], E[c], nu[c]
        C = _plane_stress(Ec, nuc)
        A = h * C
        D = h ** 3 / 12.0 * C
        G = Ec / (2.0 * (1.0 + nuc))
        As = SHEAR_K * G * h * np.eye(2)
        alpha = Ec * h ** 3

        # cell dof vector layout: [u dofs: 9 nodes x (ux,uy,uz)] then
        # [theta dofs: 4 nodes x (tx,ty,tz)] = 27 + 12 = 39
        gdofs = np.concatenate([
            (3 * sq.cell_dofs[c][:, None] + np.arange(3)).ravel(),
            3 * nQ2 + (3 * conn[c][:, None] + np.arange(3)).ravel(),
        ])
        Ke = np.zeros((39, 39))
        Me = np.zeros((39, 39)) if rho is not None else None
        Fe = np.zeros(39)
        fv = f_nodal[conn[c]]  # (4, 3)
        for a, b, w in qpts:
            phi2, dref2 = Q2Space.tab(a, b)
            phi1, dref1 = _q1_tab(a, b)
            J = dref1.T @ xy  # (2, 2): dx/dref
            detJ = abs(np.linalg.det(J))
            Jinv = np.linalg.inv(J)
            g2 = dref2 @ Jinv  # (9, 2) physical grads
            g1 = dref1 @ Jinv  # (4, 2)
            wx = w * detJ

            # membrane: e_v = (dux/dx, duy/dy, dux/dy + duy/dx)
            Bm = np.zeros((3, 39))
            Bm[0, 0:27:3] = g2[:, 0]
            Bm[1, 1:27:3] = g2[:, 1]
            Bm[2, 0:27:3] = g2[:, 1]
            Bm[2, 1:27:3] = g2[:, 0]
            # bending: loc = [-dthy/dx_j ; dthx/dx_j], k_v voigt of sym(loc)
            # k_v = (-dthy/dx, dthx/dy, -dthy/dy + dthx/dx)
            Bb = np.zeros((3, 39))
            Bb[0, 27 + 1::3] = -g1[:, 0]
            Bb[1, 27 + 0::3] = g1[:, 1]
            Bb[2, 27 + 1::3] = -g1[:, 1]
            Bb[2, 27 + 0::3] = g1[:, 0]
            # shear: gamma = (thy + duz/dx, -thx + duz/dy)
            Bs = np.zeros((2, 39))
            Bs[0, 2:27:3] = g2[:, 0]
            Bs[1, 2:27:3] = g2[:, 1]
            Bs[0, 27 + 1::3] = phi1
            Bs[1, 27 + 0::3] = -phi1
            # drilling scalar: 0.5(dux/dy - duy/dx) + thz
            bd = np.zeros(39)
            bd[0:27:3] = 0.5 * g2[:, 1]
            bd[1:27:3] = -0.5 * g2[:, 0]
            bd[27 + 2::3] = phi1

            Ke += wx * (Bm.T @ A @ Bm + Bb.T @ D @ Bb + Bs.T @ As @ Bs
                        + (alpha / hc ** 2) * np.outer(bd, bd))
            fq = phi1 @ fv  # (3,)
            Fe[0:27:3] += wx * phi2 * fq[0]
            Fe[1:27:3] += wx * phi2 * fq[1]
            Fe[2:27:3] += wx * phi2 * fq[2]
            if rho is not None:
                # rho h (phi_a phi_b) per disp component;
                # rho h hc^2 (psi_a psi_b) per rotation component
                mq2 = rho * h * np.outer(phi2, phi2)
                mq1 = rho * h * hc ** 2 * np.outer(phi1, phi1)
                for comp in range(3):
                    Me[comp:27:3, comp:27:3] += wx * mq2
                    Me[27 + comp::3, 27 + comp::3] += wx * mq1

        rows.append(np.repeat(gdofs, 39))
        cols.append(np.tile(gdofs, 39))
        vals.append(Ke.ravel())
        if rho is not None:
            mvals.append(Me.ravel())
        F[gdofs] += Fe

    ij = (np.concatenate(rows), np.concatenate(cols))
    K = sp.csr_matrix((np.concatenate(vals), ij), shape=(n_total, n_total))
    M = (sp.csr_matrix((np.concatenate(mvals), ij),
                       shape=(n_total, n_total)) if rho is not None else None)
    return dict(K=K, M=M, F=F, space=sq, nn=nn, n_total=n_total)


def _fixed_mask(out, coords, bc_func):
    sq, nn, n_total = out["space"], out["nn"], out["n_total"]
    nQ2 = sq.n_dofs
    fixed = np.zeros(n_total, dtype=bool)
    m2 = bc_func(sq.dof_xy)
    m1 = bc_func(np.asarray(coords)[:, :2])
    for comp in range(3):
        fixed[3 * np.where(m2)[0] + comp] = True
        fixed[3 * nQ2 + 3 * np.where(m1)[0] + comp] = True
    return fixed


def _split_vertex_fields(out, u):
    sq, nn = out["space"], out["nn"]
    u_vert = u[: 3 * sq.n_dofs].reshape(sq.n_dofs, 3)[:nn]
    th_vert = u[3 * sq.n_dofs:].reshape(nn, 3)
    return u_vert, th_vert


def solve_rm_plate(coords, conn, thickness, E, nu, f_nodal, bc_func):
    """Assemble + solve the clamped static RM plate. Returns
    (u_vert (nn,3), th_vert (nn,3)) nodal fields at mesh vertices."""
    out = assemble_rm_plate(coords, conn, thickness, E, nu, f_nodal)
    fixed = _fixed_mask(out, coords, bc_func)
    free = ~fixed
    K, F, n_total = out["K"], out["F"], out["n_total"]
    u = np.zeros(n_total)
    u[free] = spla.spsolve(K[np.ix_(free, free)].tocsc(), F[free])
    return _split_vertex_fields(out, u)


def implicit_midpoint_history(coords, conn, thickness, E, nu, rho, dt,
                              f_nodal_history, bc_func):
    """Independent implicit-midpoint transient: per step solve
    A w = F_i + (2/dt^2) M w_old + (2/dt) M wdot_old - K w_old / 2,
    A = (2/dt^2) M + K/2, Dirichlet rows eliminated;
    wdot = (2/dt)(w - w_old) - wdot_old; w_0 = wdot_0 = 0.

    f_nodal_history: (time_levels, nn, 3); row 0 is the (unused) initial
    level. Returns (time_levels, nn, 3) vertex displacement history."""
    out = assemble_rm_plate(coords, conn, thickness, E, nu,
                            f_nodal_history[1], rho=rho)
    K, M, sq, n_total = out["K"], out["M"], out["space"], out["n_total"]
    fixed = _fixed_mask(out, coords, bc_func)
    free = ~fixed
    # per-level consistent load vectors
    Fs = []
    for f in f_nodal_history:
        o = assemble_rm_plate(coords, conn, thickness, E, nu, f)
        Fs.append(o["F"])
    A = ((2.0 / dt ** 2) * M + 0.5 * K)[np.ix_(free, free)].tocsc()
    lu = spla.splu(A)
    w = np.zeros(n_total)
    wd = np.zeros(n_total)
    hist = [_split_vertex_fields(out, w)[0].copy()]
    for i in range(1, len(Fs)):
        b = (Fs[i] + (2.0 / dt ** 2) * (M @ w) + (2.0 / dt) * (M @ wd)
             - 0.5 * (K @ w))
        w_new = np.zeros(n_total)
        w_new[free] = lu.solve(b[free])
        wd = (2.0 / dt) * (w_new - w) - wd
        w = w_new
        hist.append(_split_vertex_fields(out, w)[0].copy())
    return np.stack(hist, axis=0)


def beam_hermite_solution(nel, L, E, width, thickness, tip_load):
    """Independent Euler-Bernoulli Hermite beam: classic closed-form element
    stiffness (EI/l^3 [[12,6l,...]]), tip point load. Returns (deflections
    (nel+1,), rotations (nel+1,))."""
    EI = E * width * np.asarray(thickness) ** 3 / 12.0
    le = L / nel
    n = 2 * (nel + 1)
    K = np.zeros((n, n))
    base = np.array([
        [12.0, 6.0 * le, -12.0, 6.0 * le],
        [6.0 * le, 4.0 * le ** 2, -6.0 * le, 2.0 * le ** 2],
        [-12.0, -6.0 * le, 12.0, -6.0 * le],
        [6.0 * le, 2.0 * le ** 2, -6.0 * le, 4.0 * le ** 2],
    ]) / le ** 3
    for e in range(nel):
        idx = [2 * e, 2 * e + 1, 2 * e + 2, 2 * e + 3]
        K[np.ix_(idx, idx)] += EI[e] * base
    F = np.zeros(n)
    F[-2] = tip_load
    free = np.arange(2, n)
    u = np.zeros(n)
    u[free] = np.linalg.solve(K[np.ix_(free, free)], F[free])
    return u[0::2], u[1::2]
