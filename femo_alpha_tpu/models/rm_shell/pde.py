"""Reissner-Mindlin shell PDE: energy kernels, penalty BC, outputs, maps.

Rebuilds RMShellPDE + ElasticModelShapeOpt + ShellStressRM
(rm_shell/rm_shell_pde.py:21-293, linear_shell_fenicsx/linear_shell_model.py:
192-473) as pure-JAX cell kernels over a mixed CG2(vec3) x CG1(vec3) space:

- energy = membrane + bending + shear + drilling − load work; the residual is
  jax.grad of the energy (the reference takes the Gateaux derivative,
  linear_shell_model.py:308-321)
- shape derivatives flow through the mesh-motion field uhat exactly as in the
  reference: gradients are pulled back by inv(I + grad uhat) and measures
  carry det(I + grad uhat)
- J(uhat) measure placement REPLICATES the reference exactly: shear/drilling/
  load/penalty/outputs carry J, membrane+bending do NOT
  (linear_shell_model.py:273-296 — kept for derivative parity)
- penalty Dirichlet BC: beta/h_E * ||J F^{-T} N|| * |w - g|^2 facet energy
  with beta = 1e15 (penaltyResidual linear_shell_model.py:323-333)
- stress recovery: through-thickness displacement u(xi2) = u_mid - xi2 (E2 x
  theta), plane-stress von Mises excluding transverse shear
  (ShellStressRM linear_shell_model.py:350-473)
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ...assembly.assemble import FemForm, gather_dofs
from ...assembly.facets import FacetForm, select_facets
from ...elements import tabulate
from ...spaces import FunctionSpace, MixedSpace
from .kinematics import (
    cell_diameter,
    deformation,
    phys_grad_table,
    surface_geometry,
    sym2,
    voigt2d,
)
from .material import plane_stress_C, single_layer_clt

PENALTY_BETA = 1e15  # linear_shell_model.py:324


def _interp_factory(space, phi):
    """Pointwise interpolation closure for a scalar param space: DG0 -> cell
    constant; CG1 -> nodal interpolation with the CG1 table."""
    if space.family == "DG" and space.degree == 0:
        return lambda vals: jnp.broadcast_to(vals[0], (phi.shape[0],))
    return lambda vals: jnp.asarray(phi) @ vals


def _interp_vec_factory(space, phi, vs=3):
    if space.family == "DG" and space.degree == 0:
        return lambda vals: jnp.broadcast_to(
            vals.reshape(1, vs), (phi.shape[0], vs)
        )
    return lambda vals: jnp.asarray(phi) @ vals.reshape(-1, vs)


class RMShellPDE:
    """Spaces + kernels for the RM shell (RMShellPDE parity,
    rm_shell_pde.py:21-48)."""

    def __init__(
        self,
        mesh,
        element_wise_material=False,
        elementwise_pressure=False,
        element_type="CG2CG1",
        inplane_deg=4,
        shear_deg=4,
        stress_deg=4,
        bot_plane=False,
        dtype=None,
        composite=None,
    ):
        self.mesh = mesh
        # composite: CompositeCLT per-cell laminate data; replaces the
        # isotropic single-layer CLT in the elastic energy (parity with
        # MaterialModelComposite, linear_shell_model.py:159-190). Drilling
        # stabilization and stress recovery stay isotropic (E, nu, thickness
        # params), matching the reference's behavior.
        self.composite = composite
        # dtype: build all static tables (and forms) in this precision; None
        # follows the global default (f64). See FemForm dtype / TPU notes.
        self.dtype = dtype
        self.element_wise_material = element_wise_material
        self.elementwise_pressure = elementwise_pressure
        self.bot_plane = bot_plane
        ct = mesh.cell_type
        if element_type == "CG2CG1":
            self.V_disp = FunctionSpace(mesh, "P", 2, value_size=3)
            self.V_rot = FunctionSpace(mesh, "P", 1, value_size=3)
            rot_fam, rot_deg = "P", 1
        elif element_type == "CG2CR1":
            assert ct == "triangle", "CG2CR1 is triangles-only"
            self.V_disp = FunctionSpace(mesh, "P", 2, value_size=3)
            self.V_rot = FunctionSpace(mesh, "CR", 1, value_size=3)
            rot_fam, rot_deg = "CR", 1
        elif element_type == "CG1CG1":
            self.V_disp = FunctionSpace(mesh, "P", 1, value_size=3)
            self.V_rot = FunctionSpace(mesh, "P", 1, value_size=3)
            rot_fam, rot_deg = "P", 1
        else:
            raise ValueError(element_type)
        self.element_type = element_type
        self.rot_fam, self.rot_deg = rot_fam, rot_deg
        self.disp_deg = self.V_disp.degree
        self.inplane_deg, self.shear_deg = inplane_deg, shear_deg
        self.stress_deg = stress_deg
        self.W = MixedSpace(self.V_disp, self.V_rot)
        # thickness/material space (rm_shell_pde.py:37-40)
        self.VT = FunctionSpace(mesh, "DG" if element_wise_material else "P",
                                0 if element_wise_material else 1)
        # force space (rm_shell_pde.py:41-44)
        self.VF = FunctionSpace(mesh, "DG" if elementwise_pressure else "P",
                                0 if elementwise_pressure else 1, value_size=3)
        # mesh-motion space
        self.VU = FunctionSpace(mesh, "P", 1, value_size=3)

        self.nd_disp = self.V_disp.element.ndof
        self.nd_rot = self.V_rot.element.ndof
        self.nv = mesh.conn.shape[1]

        # quadrature tables: disp/rot/geometry all tabulated at shared points
        self._rules = {}
        for name, deg in [("inplane", inplane_deg), ("shear", shear_deg),
                          ("stress", stress_deg)]:
            from ...elements.quadrature import quadrature_rule

            pts, w = quadrature_rule(ct, deg)
            tab_d = tabulate(self.V_disp.family, ct, self.disp_deg, points=pts,
                             weights=w)
            tab_r = tabulate(rot_fam, ct, rot_deg, points=pts, weights=w)
            tab_t = tabulate(self.VT.family, ct, self.VT.degree, points=pts,
                             weights=w)
            tab_f = tabulate(self.VF.family, ct, self.VF.degree, points=pts,
                             weights=w)
            if dtype is not None:
                tab_d, tab_r, tab_t, tab_f = (
                    t.astype(dtype) for t in (tab_d, tab_r, tab_t, tab_f))
                w = np.asarray(w, dtype=dtype)
            self._rules[name] = dict(d=tab_d, r=tab_r, t=tab_t, f=tab_f,
                                     w=jnp.asarray(w))

        self.param_specs = {
            "thickness": self.VT,
            "E": self.VT,
            "nu": self.VT,
            "uhat": self.VU,
            "F_solid": self.VF,
        }

    # ---------------------------------------------------------------- core
    def _split(self, u_cell):
        nd2, nd1 = self.nd_disp, self.nd_rot
        ud = u_cell[: nd2 * 3].reshape(nd2, 3)
        th = u_cell[nd2 * 3: nd2 * 3 + nd1 * 3].reshape(nd1, 3)
        return ud, th

    def _pointwise(self, rule, u_cell, x_cell, p, need_f=False):
        """Shared per-quadrature-point fields for one rule."""
        R = self._rules[rule]
        tab_d, tab_r, tab_t = R["d"], R["r"], R["t"]
        ud, th = self._split(u_cell)
        uhat = p["uhat"].reshape(self.nv, 3)
        geo = surface_geometry(x_cell, tab_d.geom_dphi)
        dphi_d = phys_grad_table(tab_d.dphi, geo["Pi"])  # (nq, nd2, 3)
        dphi_r = phys_grad_table(tab_r.dphi, geo["Pi"])
        dphi_g = phys_grad_table(tab_d.geom_dphi, geo["Pi"])  # CG1 geometry
        F, Finv, detF = deformation(uhat, dphi_g)
        # physical (deformed-config) gradients: gradx = grad . inv(F)
        Gu = jnp.einsum("ai,qag->qig", ud, dphi_d)
        gradx_u = jnp.einsum("qig,qgh->qih", Gu, Finv)
        Gth = jnp.einsum("ai,qag->qig", th, dphi_r)
        gradx_th = jnp.einsum("qig,qgh->qih", Gth, Finv)
        th_q = jnp.asarray(tab_r.phi) @ th  # (nq, 3)
        u_q = jnp.asarray(tab_d.phi) @ ud
        E0, E1, E2 = geo["E0"], geo["E1"], geo["E2"]
        T = jnp.stack([E0, E1], axis=1)  # (nq, 2, 3)
        interp_t = _interp_factory(self.VT, tab_t.phi)
        tq = interp_t(p["thickness"])
        Eq = interp_t(p["E"])
        nuq = interp_t(p["nu"])
        out = dict(
            geo=geo, detF=detF, Finv=Finv, T=T, E2=E2,
            gradx_u=gradx_u, gradx_th=gradx_th, th_q=th_q, u_q=u_q,
            tq=tq, Eq=Eq, nuq=nuq, w=R["w"], dA=geo["dA"],
        )
        if need_f:
            interp_f = _interp_vec_factory(self.VF, R["f"].phi)
            out["f_q"] = interp_f(p["F_solid"])
        return out

    def _clt(self, pt, p):
        """(A, B, D, A_s) at the rule's quadrature points: per-cell composite
        arrays broadcast over points, or isotropic single-layer CLT."""
        if self.composite is not None:
            nq = pt["tq"].shape[0]
            bc = lambda M, s: jnp.broadcast_to(M, (nq,) + s)  # noqa: E731
            return (bc(p["clt_A"], (3, 3)), bc(p["clt_B"], (3, 3)),
                    bc(p["clt_D"], (3, 3)), bc(p["clt_As"], (2, 2)))
        return single_layer_clt(pt["Eq"], pt["nuq"], pt["tq"],
                                bot=self.bot_plane)

    def _cell_consts(self):
        if self.composite is None:
            return None
        c = self.composite
        return {"clt_A": c.A, "clt_B": c.B, "clt_D": c.D, "clt_As": c.As}

    @staticmethod
    def _strains(pt):
        """(eps, kappa, gamma, t_gu) in the local frame — parity with
        ElasticModelShapeOpt.local_* (linear_shell_model.py:232-258)."""
        T, E2 = pt["T"], pt["E2"]
        gradx_u, gradx_th, th_q = pt["gradx_u"], pt["gradx_th"], pt["th_q"]
        t_gu = jnp.einsum("qik,qkl,qjl->qij", T, gradx_u, T)
        # grad(E2 x theta) ~ E2 x grad(theta) column-wise (E2 element frame)
        gradphi = jnp.cross(
            E2[:, :, None], gradx_th, axisa=1, axisb=1, axisc=1
        )
        kappa = sym2(jnp.einsum("qik,qkl,qjl->qij", T, gradphi, T))
        eps = sym2(t_gu)  # MID plane: zero offset (offset field: future)
        # transverse shear gamma[i] = (T(-E2 x th))_i + (T (gradx_u^T E2))_i
        du2 = -jnp.cross(E2, th_q)
        g1 = jnp.einsum("qij,qj->qi", T, du2)
        g2 = jnp.einsum("qij,qj->qi", T,
                        jnp.einsum("qk,qkj->qj", E2, gradx_u))
        gamma = g1 + g2
        return eps, kappa, gamma, t_gu

    # ------------------------------------------------------------- energies
    def make_elastic_energy_kernel(self, with_load=True, with_drilling=True):
        """Cell energy kernel (inplane+shear+drilling [-load]) — the
        elasticEnergy of the reference (linear_shell_model.py:298-306)."""

        def energy(u_cell, x_cell, p):
            # membrane + bending at the inplane rule (NO detF: parity with
            # membraneEnergy/bendingEnergy which omit J(uhat))
            pi = self._pointwise("inplane", u_cell, x_cell, p,
                                 need_f=with_load)
            eps, kappa, gamma_ip, t_gu = self._strains(pi)
            A, B, D, As = self._clt(pi, p)
            ev = voigt2d(eps)
            kv = voigt2d(kappa)
            N = jnp.einsum("qij,qj->qi", A, ev) + jnp.einsum(
                "qij,qj->qi", B, kv)
            M = jnp.einsum("qij,qj->qi", B, ev) + jnp.einsum(
                "qij,qj->qi", D, kv)
            wdA = pi["w"] * pi["dA"]
            E_mb = jnp.sum(0.5 * jnp.sum(N * ev + M * kv, axis=1) * wdA)
            total = E_mb
            if with_drilling:
                # drilling stabilization (linear_shell_model.py:284-296):
                # strain = skew(t_gu) + theta.E2, alpha = E h^3 / h_mesh^2
                h_mesh = cell_diameter(x_cell)
                dstrain = 0.5 * (t_gu[:, 0, 1] - t_gu[:, 1, 0]) + jnp.einsum(
                    "qi,qi->q", pi["th_q"], pi["E2"])
                alpha = pi["Eq"] * pi["tq"] ** 3
                E_dr = jnp.sum(
                    0.5 * alpha * dstrain**2 / h_mesh**2 * pi["detF"] * wdA
                )
                total = total + E_dr
            if with_load:
                E_ld = -jnp.sum(
                    jnp.sum(pi["f_q"] * pi["u_q"], axis=1)
                    * pi["detF"] * wdA
                )
                total = total + E_ld
            # shear at the (possibly reduced) shear rule, with detF
            ps = self._pointwise("shear", u_cell, x_cell, p)
            _, _, gamma, _ = self._strains(ps)
            _, _, _, As_s = self._clt(ps, p)
            Q = jnp.einsum("qij,qj->qi", As_s, gamma)
            E_sh = jnp.sum(
                0.5 * jnp.sum(Q * gamma, axis=1) * ps["detF"]
                * ps["w"] * ps["dA"]
            )
            return total + E_sh

        return energy

    def make_residual_form(self):
        kern = self.make_elastic_energy_kernel(with_load=True)
        return FemForm(self.W, kern, kind="energy",
                       param_specs=dict(self.param_specs),
                       dtype=self.dtype, cell_consts=self._cell_consts())

    # ------------------------------------------------------------ penalty BC
    def make_penalty_facet_form(self, bc_locs_func, quad_degree=4,
                                include_interior=True):
        """Penalty Dirichlet facet energy on tagged facets (parity:
        penaltyResidual with g=0, beta=1e15, Nanson-transformed measure,
        linear_shell_model.py:323-333). Exterior facets once (ds); tagged
        INTERIOR facets once per incident cell — C0 shared dofs make that
        exactly the reference's ('+') + ('-') dSS pair, and non-manifold
        junction edges (3 incident cells, rib-stiffened wings) penalize all
        incidences. Interior tagging follows the dolfinx locate_entities
        all-vertices rule (utils_dolfinx.py:555-565)."""
        cells, locals_ = select_facets(self.mesh, bc_locs_func)
        if include_interior:
            icells, ilocals = self.mesh.interior_facets(bc_locs_func)
            cells = np.concatenate([np.asarray(cells), icells])
            locals_ = np.concatenate([np.asarray(locals_), ilocals])
        families = [(self.V_disp.family, self.disp_deg),
                    (self.rot_fam, self.rot_deg)]
        nd2, nd1, nv = self.nd_disp, self.nd_rot, self.nv

        def factory(tabs):
            phi_d, _ = tabs.tabs[(self.V_disp.family, self.disp_deg)]
            phi_r, _ = tabs.tabs[(self.rot_fam, self.rot_deg)]
            phi_d = jnp.asarray(phi_d)
            phi_r = jnp.asarray(phi_r)
            dxi_dt = jnp.asarray(tabs.dxi_dt)
            w1d = jnp.asarray(tabs.weights)

            def energy(u_cell, x_cell, p):
                ud = u_cell[: nd2 * 3].reshape(nd2, 3)
                th = u_cell[nd2 * 3:].reshape(nd1, 3)
                uhat = p["uhat"].reshape(nv, 3)
                geo = surface_geometry(x_cell, tabs.geom_dphi)
                dphi_g = phys_grad_table(tabs.geom_dphi, geo["Pi"])
                F, Finv, detF = deformation(uhat, dphi_g)
                tvec = jnp.einsum("qgr,r->qg", geo["Jg"], dxi_dt)
                tlen = jnp.sqrt(jnp.sum(tvec * tvec, axis=1))
                that = tvec / tlen[:, None]
                # in-plane outward-ish facet normal (orientation-free use)
                N = jnp.cross(that, geo["E2"])
                # Nanson: n da = J F^{-T} N dA
                v = detF[:, None] * jnp.einsum("qgh,qg->qh", Finv, N)
                normN = jnp.sqrt(jnp.sum(v * v, axis=1))
                u_q = phi_d @ ud
                th_q = phi_r @ th
                h_E = cell_diameter(x_cell)
                mag2 = jnp.sum(u_q**2, axis=1) + jnp.sum(th_q**2, axis=1)
                return jnp.sum(
                    0.5 * PENALTY_BETA / h_E * normN * mag2 * tlen * w1d
                )

            return energy

        return FacetForm(
            self.W, factory, cells, locals_,
            param_specs={"uhat": self.VU},
            quad_degree=quad_degree, families=families,
        )

    # ------------------------------------------------------------- outputs
    def regularization_kernel(self, kind):
        """Thickness regularization energies (rm_shell_pde.py:64-83):
        L2: 0.5e-2 ∫ h^2 dx; H1: 0.5e-2 ∫ |grad h|^2 dx (reference measure)."""
        R = self._rules["inplane"]
        tab_t = R["t"]
        interp_t = _interp_factory(self.VT, tab_t.phi)
        alpha1 = 1e-2

        def kern(u_cell, x_cell, p):
            geo = surface_geometry(x_cell, tab_t.geom_dphi)
            wdA = R["w"] * geo["dA"]
            hq = interp_t(p["thickness"])
            if kind == "L2":
                return jnp.sum(0.5 * alpha1 * hq**2 * wdA)
            # H1 (nodal thickness only)
            dphi_t = phys_grad_table(tab_t.dphi, geo["Pi"])
            gh = jnp.einsum("a,qag->qg", p["thickness"], dphi_t)
            return jnp.sum(0.5 * alpha1 * jnp.sum(gh * gh, axis=1) * wdA)

        return kern

    def compliance_form(self):
        """∫ |u_mid|^2 J(uhat) dx + regularization (rm_shell_pde.py:85-89)."""
        reg = self.regularization_kernel(
            "L2" if self.element_wise_material else "H1")

        R = self._rules["inplane"]
        tab_d = R["d"]
        nv = self.nv

        def kern(u_cell, x_cell, p):
            ud, _ = self._split(u_cell)
            geo = surface_geometry(x_cell, tab_d.geom_dphi)
            dphi_g = phys_grad_table(tab_d.geom_dphi, geo["Pi"])
            _, _, detF = deformation(p["uhat"].reshape(nv, 3), dphi_g)
            u_q = jnp.asarray(tab_d.phi) @ ud
            val = jnp.sum(
                jnp.sum(u_q**2, axis=1) * detF * R["w"] * geo["dA"])
            return val + reg(u_cell, x_cell, p)

        return FemForm(self.W, kern, kind="energy",
                       param_specs={"thickness": self.VT, "uhat": self.VU})

    def mass_form(self):
        """∫ rho h J(uhat) dx (rm_shell_pde.py:101-102). Registered over the
        thickness 'field' as primary argument."""
        R = self._rules["inplane"]
        interp_t = _interp_factory(self.VT, R["t"].phi)

        def kern(h_cell, x_cell, p):
            geo = surface_geometry(x_cell, R["t"].geom_dphi)
            dphi_g = phys_grad_table(R["t"].geom_dphi, geo["Pi"])
            _, _, detF = deformation(p["uhat"].reshape(self.nv, 3), dphi_g)
            hq = interp_t(h_cell)
            rhoq = interp_t(p["density"])
            return jnp.sum(rhoq * hq * detF * R["w"] * geo["dA"])

        return FemForm(self.VT, kern, kind="energy",
                       param_specs={"density": self.VT, "uhat": self.VU})

    def volume_form(self):
        R = self._rules["inplane"]
        interp_t = _interp_factory(self.VT, R["t"].phi)

        def kern(h_cell, x_cell, p):
            geo = surface_geometry(x_cell, R["t"].geom_dphi)
            dphi_g = phys_grad_table(R["t"].geom_dphi, geo["Pi"])
            _, _, detF = deformation(p["uhat"].reshape(self.nv, 3), dphi_g)
            hq = interp_t(h_cell)
            return jnp.sum(hq * detF * R["w"] * geo["dA"])

        return FemForm(self.VT, kern, kind="energy",
                       param_specs={"uhat": self.VU})

    def elastic_energy_form(self):
        kern = self.make_elastic_energy_kernel(with_load=False)
        specs = dict(self.param_specs)
        specs.pop("F_solid")
        return FemForm(self.W, kern, kind="energy", param_specs=specs,
                       dtype=self.dtype, cell_consts=self._cell_consts())

    def inertia_form(self, rho_is_param=True, with_uhat=False):
        """Shell inertia as an energy: 0.5 rho h (|u|^2 + h_mesh^2 |theta|^2)
        — its Hessian is the mass operator of inertialResidual
        (linear_shell_model.py:335-348; rotational inertia scaled by the
        mesh-size-squared stabilization, following the reference).
        with_uhat: include the J(uhat) deformed-configuration pullback of
        the reference's inertialResidual (the modal/shape-derivative path;
        the transient simulator integrates on the reference configuration
        and omits it)."""
        R = self._rules["inplane"]
        tab_d, tab_r, tab_t = R["d"], R["r"], R["t"]
        interp_t = _interp_factory(self.VT, tab_t.phi)
        nv = self.nv

        def kern(u_cell, x_cell, p):
            ud, th = self._split(u_cell)
            geo = surface_geometry(x_cell, tab_d.geom_dphi)
            u_q = jnp.asarray(tab_d.phi) @ ud
            th_q = jnp.asarray(tab_r.phi) @ th
            hq = interp_t(p["thickness"])
            rhoq = interp_t(p["density"]) if rho_is_param else p["rho"]
            hm = cell_diameter(x_cell)
            dens = rhoq * hq * (
                jnp.sum(u_q**2, axis=1) + hm**2 * jnp.sum(th_q**2, axis=1)
            )
            if with_uhat:
                dphi_g = phys_grad_table(tab_d.geom_dphi, geo["Pi"])
                _, _, detF = deformation(p["uhat"].reshape(nv, 3), dphi_g)
                dens = dens * detF
            return jnp.sum(0.5 * dens * R["w"] * geo["dA"])

        specs = {"thickness": self.VT}
        if rho_is_param:
            specs["density"] = self.VT
        else:
            specs["rho"] = None
        if with_uhat:
            specs["uhat"] = self.VU
        return FemForm(self.W, kern, kind="energy", param_specs=specs)

    def self_weight_load(self, g_z):
        """Consistent self-weight load vector energy: -∫ rho t g u_z dx
        (plate_sim.py:203-213). Returns an energy FemForm; its residual is
        the (negative) load vector."""
        R = self._rules["inplane"]
        tab_d, tab_t = R["d"], R["t"]
        interp_t = _interp_factory(self.VT, tab_t.phi)

        def kern(u_cell, x_cell, p):
            ud, _ = self._split(u_cell)
            geo = surface_geometry(x_cell, tab_d.geom_dphi)
            u_q = jnp.asarray(tab_d.phi) @ ud
            hq = interp_t(p["thickness"])
            rhoq = interp_t(p["density"])
            return -jnp.sum(
                rhoq * hq * g_z * u_q[:, 2] * R["w"] * geo["dA"])

        return FemForm(self.W, kern, kind="energy",
                       param_specs={"thickness": self.VT,
                                    "density": self.VT})

    # --------------------------------------------------------- stress
    def _vm_stress_at_q(self, pt, xi2):
        """Plane-stress von Mises at through-thickness coordinate xi2
        (ShellStressRM.vonMisesStress; transverse shear excluded)."""
        T, E2 = pt["T"], pt["E2"]
        # grad u(xi2) = gradx_u - xi2 * (E2 x gradx_th)
        gradphi = jnp.cross(
            E2[:, :, None], pt["gradx_th"], axisa=1, axisb=1, axisc=1)
        grad_u_xi2 = pt["gradx_u"] - xi2[:, None, None] * gradphi
        loc = jnp.einsum("qik,qkl,qjl->qij", T, grad_u_xi2, T)
        eps = voigt2d(sym2(loc))
        C = plane_stress_C(pt["Eq"], pt["nuq"])
        sig = jnp.einsum("qij,qj->qi", C, eps)
        vm2 = sig[:, 0] ** 2 - sig[:, 0] * sig[:, 1] + sig[:, 1] ** 2 \
            + 3.0 * sig[:, 2] ** 2
        return jnp.sqrt(jnp.clip(vm2, a_min=1e-300))

    def pnorm_stress_form(self, m=1e-6, rho=100, alpha=None, surface="Top",
                          cell_mask=None):
        """∫ (m σ_vM)^rho J dx / alpha at the stress rule
        (rm_shell_pde.py:112-128). alpha defaults to the reference surface
        area (a CONSTANT, computed once — parity with assemble_scalar at
        form-construction time with uhat = 0)."""
        R = self._rules["stress"]
        if alpha is None:
            alpha = self.surface_area()
        mask = None if cell_mask is None else jnp.asarray(
            cell_mask, dtype=jnp.result_type(float))

        def kern(u_cell, x_cell, p):
            pt = self._pointwise("stress", u_cell, x_cell, p)
            sgn = {"Top": 0.5, "Mid": 0.0, "Bot": -0.5}[surface]
            vm = self._vm_stress_at_q(pt, sgn * pt["tq"])
            val = jnp.sum((m * vm) ** rho * pt["detF"] * pt["w"] * pt["dA"])
            return val / alpha

        specs = dict(self.param_specs)
        specs.pop("F_solid")
        if mask is None:
            return FemForm(self.W, kern, kind="energy", param_specs=specs)

        # subdomain variant: scale each cell energy by its tag mask
        def kern_masked(u_cell, x_cell, p):
            return kern(u_cell, x_cell, p) * p["_mask"][0]

        specs["_mask"] = FunctionSpace(self.mesh, "DG", 0)
        form = FemForm(self.W, kern_masked, kind="energy", param_specs=specs)
        form._mask_values = mask  # stored for callers
        return form

    def surface_area(self):
        """Reference (uhat=0) total surface area — the alpha constant."""
        R = self._rules["inplane"]
        x = self.W.cell_coords_d

        def cell_area(xc):
            geo = surface_geometry(xc, R["t"].geom_dphi)
            return jnp.sum(R["w"] * geo["dA"])

        return float(jnp.sum(jax.vmap(cell_area)(x)))

    def von_mises_dg1_projection(self):
        """Field output: von Mises (Top) L2-projected into DG1 — per-cell
        local mass solves (discontinuous target => embarrassingly parallel;
        replaces the global projection of rm_shell_pde.py:168-171)."""
        ct = self.mesh.cell_type
        V_out = FunctionSpace(self.mesh, "DG", 1)
        R = self._rules["stress"]
        tab_o = tabulate("DG", ct, 1, points=R["d"].points,
                         weights=R["d"].weights)
        phi_o = jnp.asarray(tab_o.phi)  # (nq, ndo)

        def project(u, params):
            W = self.W

            def cell_fn(u_cell, x_cell, p):
                pt = self._pointwise("stress", u_cell, x_cell, p)
                vm = self._vm_stress_at_q(pt, 0.5 * pt["tq"])
                wdA = pt["w"] * pt["dA"]
                Mloc = jnp.einsum("qa,qb,q->ab", phi_o, phi_o, wdA)
                b = jnp.einsum("qa,q,q->a", phi_o, vm, wdA)
                # unrolled SPD solve: the TPU plugin has no f64 LU/Cholesky
                from ...solvers.direct import solve_spd_small

                return solve_spd_small(Mloc, b)

            uc = gather_dofs(jnp.asarray(u), W.dofmap_d)
            pc, axes = _gather_like(self.param_specs, params, exclude=("F_solid",))
            vals = jax.vmap(cell_fn, in_axes=(0, 0, axes))(
                uc, W.cell_coords_d, pc)
            return vals.reshape(-1)  # DG1 dof vector (cell-major)

        return project, V_out

    # -------------------------------------------------------- interop maps
    def extract_nodal_disp(self, w):
        """CG2 -> CG1 nodal displacement extraction: with Lagrange CG2, the
        value at a mesh vertex IS its vertex dof, so the reference's basis-
        evaluation interpolation matrix (rm_shell_pde.py:255-293) reduces to
        a slice: vertex scalar dofs come first in our dofmap layout."""
        nn = self.mesh.n_nodes
        return w[: 3 * nn].reshape(nn, 3)

    def make_force_to_pressure_solver(self):
        """Differentiable solve of (VF mass matrix) p = F — the reference's
        construct_force_to_pressure_map + csdl.solve_linear
        (rm_shell_pde.py:194-209, rm_shell_model.py:418-421)."""
        from ...adjoint.implicit import ImplicitPDE

        VF = self.VF
        R = self._rules["inplane"]
        interp_f = _interp_vec_factory(VF, R["f"].phi)

        def mass_energy(f_cell, x_cell, p):
            geo = surface_geometry(x_cell, R["f"].geom_dphi)
            fq = interp_f(f_cell)
            return jnp.sum(
                0.5 * jnp.sum(fq * fq, axis=1) * R["w"] * geo["dA"])

        form = FemForm(VF, mass_energy, kind="energy", param_specs={})
        pde = ImplicitPDE(
            form,
            extra_residual=lambda u, p: -p["F_vec"],
            solver_opts={"method": "cg", "tol": 1e-12},
        )

        def solve_pressure(F_vec):
            return pde.solve({"F_vec": F_vec})

        solve_pressure.pde = pde
        return solve_pressure


def _gather_like(param_specs, params, exclude=()):
    out, axes = {}, {}
    for name, sp in param_specs.items():
        if name in exclude:
            continue
        v = params[name]
        if sp is None:
            out[name] = v
            axes[name] = None
        else:
            out[name] = gather_dofs(jnp.asarray(v), sp.dofmap_d)
            axes[name] = 0
    return out, axes
