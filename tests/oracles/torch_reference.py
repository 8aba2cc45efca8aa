"""PyTorch test oracle reproducing the reference's numerical behavior.

Used ONLY by tests, as the golden implementation to validate the JAX/TPU
rebuild against: an MLP with weights injected from a JAX parameter pytree, the
reverse-mode ``autograd.grad`` derivative primitive, and the four residual
losses with the reference's exact term structure (reference ``physics.py``,
``dnn.py``). This file is an independent re-statement of those equations for
oracle purposes, organized around weight injection rather than training.
"""

from __future__ import annotations

import numpy as np
import torch


def build_torch_mlp(jax_params: dict, init_type: str = "xavier") -> torch.nn.Module:
    """Assemble a torch Sequential equal to ``mlp_apply`` with given params."""
    act = torch.nn.Tanh() if init_type == "xavier" else torch.nn.LeakyReLU(0.01)

    def linear_from(w, b):
        w = np.asarray(w, dtype=np.float64)
        b = np.asarray(b, dtype=np.float64)
        layer = torch.nn.Linear(w.shape[0], w.shape[1]).double()
        with torch.no_grad():
            layer.weight.copy_(torch.from_numpy(w.T))  # torch stores (out, in)
            layer.bias.copy_(torch.from_numpy(b))
        return layer

    mods: list[torch.nn.Module] = []
    if jax_params["w_in"].shape[1] > 0:
        mods += [linear_from(jax_params["w_in"], jax_params["b_in"]), act]
        for w, b in zip(np.asarray(jax_params["w_hidden"]), np.asarray(jax_params["b_hidden"])):
            mods += [linear_from(w, b), act]
    mods.append(linear_from(jax_params["w_out"], jax_params["b_out"]))
    return torch.nn.Sequential(*mods)


def grad_of(pred: torch.Tensor, var: torch.Tensor) -> torch.Tensor:
    """The reference derivative primitive (reference ``physics.py:6-15``)."""
    return torch.autograd.grad(
        pred, var, grad_outputs=torch.ones_like(pred), retain_graph=True, create_graph=True
    )[0]


def predict_columns(model, coord_cols):
    """Run the model on per-coordinate leaf tensors (so autograd can
    differentiate w.r.t. each column) and return the output tensor."""
    return model(torch.cat(coord_cols, dim=-1))


def make_coord_cols(coords: np.ndarray, requires_grad=None):
    cols = []
    for i in range(coords.shape[1]):
        c = torch.tensor(coords[:, i : i + 1], dtype=torch.float64)
        rg = True if requires_grad is None else requires_grad[i]
        if rg:
            c = c.requires_grad_()
        cols.append(c)
    return cols


def loss_continuity_only(x, y, h, U, V):
    hU_x, hV_y = grad_of(h * U, x), grad_of(h * V, y)
    fc = hU_x + hV_y
    idx = torch.where(x < 25.5)
    return torch.mean(fc**2) + torch.mean((h[idx] - 0.75) ** 2)


def loss_continuity_ftemp(x, y, h, U, V):
    fc = grad_of(h * U, x) + grad_of(h * V, y)
    return torch.mean(fc**2)


def loss_navier_stokes(t, x, y, h, z, u, v):
    g, gamma_b = 9.81, 0.78
    u_t, u_x, u_y = grad_of(u, t), grad_of(u, x), grad_of(u, y)
    v_t, v_x, v_y = grad_of(v, t), grad_of(v, x), grad_of(v, y)
    z_t, z_x, z_y = grad_of(z, t), grad_of(z, x), grad_of(z, y)
    h_x, h_y = grad_of(h + z, x), grad_of(h + z, y)
    hu_x, hv_y = grad_of((h + z) * u, x), grad_of((h + z) * v, y)
    fbr_x = 3.0 / 16.0 * g * gamma_b**2 * h_x * (h + z)
    fbr_y = 3.0 / 16.0 * g * gamma_b**2 * h_y * (h + z)
    fc = z_t + hu_x + hv_y
    fm_x = u_t + u * u_x + v * u_y + g * z_x + fbr_x
    fm_y = v_t + u * v_x + v * v_y + g * z_y + fbr_y
    return torch.mean(fc**2) + torch.mean(fm_x**2) + torch.mean(fm_y**2)


def loss_wave_averaged(x, y, h, U, V, eta_mean, Hrms, k, *, corrected=False):
    g, rho, Cd = 9.81, 1025, 0.002
    u_x, u_y = grad_of(U, x), grad_of(U, y)
    v_x, v_y = grad_of(V, x), grad_of(V, y)
    z_x, z_y = grad_of(eta_mean, x), grad_of(eta_mean, y)
    tau_bx = rho * Cd * U * abs(U)
    tau_by = rho * Cd * V * abs(V)
    if corrected:
        # the intended prefactor (what parity=False computes): (1/8) rho g H^2
        E = rho * g * Hrms**2 / 8.0
    else:
        E = 1 / 8**rho * g * Hrms**2  # the reference's precedence quirk, verbatim
    Sxx = E * (2 * k * h / torch.sinh(2 * k * h) + 0.5)
    Syy = E * (1 * k * h / torch.sinh(2 * k * h) + 0.0)
    Sxx_x, Syy_y = grad_of(Sxx, x), grad_of(Syy, y)
    fc = u_x + v_y
    fx = U * u_x + V * u_y + g * z_x + 1 / (rho * (eta_mean + h)) * Sxx_x + 1 / (
        rho * (eta_mean + h)
    ) * tau_bx
    fy = U * v_x + V * v_y + g * z_y + 1 / (rho * (eta_mean + h)) * Syy_y + 1 / (
        rho * (eta_mean + h)
    ) * tau_by
    return torch.mean(fc**2) + torch.mean(fx**2) + torch.mean(fy**2)
