"""Loss parity: rebuild vs reference-semantics torch loop on the 5
BASELINE.json tutorial configs.

BASELINE.md's "numerical parity at matching residual-loss tolerance" row,
measured: for each workload both sides train with the SAME architecture,
iteration budget, batch size and learning rate; we record

* ``final_train_loss`` — mean of the last 10 per-iteration losses (smooths
  batch noise);
* ``eval_residual_mse`` — mean squared equation residual on a FIXED
  evaluation grid (same points both sides; the apples-to-apples number);
* ``max_analytic_err`` — max |prediction - closed form| where one exists.

The torch loops reproduce the reference's per-iteration semantics
(per-coordinate leaf tensors, nested ``autograd.grad`` residual, the
``anzatc`` condition-binding transform of ``model_torch.py:107-130``, fresh
Adam, MSE-to-zero loss — ``model_torch.py:364-464``); the reference package
itself needs batchflow, which is not installed.

Run: ``python benchmarks/bench_loss_parity.py`` (jax side on the default
backend — TPU here; torch on CPU).  Prints one JSON line per workload and a
final markdown table for BENCHMARKS.md.
"""

import json
import time

import numpy as np

RESULTS = []


# ---------------------------------------------------------------------------
# torch side: reference-semantics machinery
# ---------------------------------------------------------------------------

def _torch_net(dims, activation):
    import torch
    from torch import nn

    acts = {"Tanh": nn.Tanh, "Sigmoid": nn.Sigmoid}
    layers = []
    for i in range(len(dims) - 1):
        layers.append(nn.Linear(dims[i], dims[i + 1]))
        if i < len(dims) - 2:
            layers.append(acts[activation]())
    return nn.Sequential(*layers)


class TorchAnsatz:
    """The reference's ``anzatc`` transform (model_torch.py:107-130) on a
    [0,1]^d domain: boundary binding by the product gate, initial-condition
    binding by the sigmoid time gate with trainable ``log_scale``."""

    def __init__(self, net, ndims, ic=None, bc=None):
        import torch

        self.net = net
        self.ndims = ndims
        self.ndims_spatial = ndims - 1 if ic is not None else ndims
        self.ic = ic
        self.bc = bc
        self.log_scale = torch.nn.Parameter(torch.tensor(0.0))

    def parameters(self):
        return list(self.net.parameters()) + [self.log_scale]

    def __call__(self, xs):
        import torch

        u = self.net(xs)
        xs_spatial = xs[:, :self.ndims_spatial]
        t = xs[:, self.ndims - 1:self.ndims]
        if self.bc is not None:
            u = (u * (torch.prod(xs_spatial, dim=1, keepdim=True)
                      * torch.prod(1 - xs_spatial, dim=1, keepdim=True))
                 + self.bc)
        if self.ic is not None:
            spatial_cols = [xs_spatial[:, i] for i in
                            range(xs_spatial.shape[1])]
            ic_val = self.ic(*spatial_cols)
            if not torch.is_tensor(ic_val):
                ic_val = torch.as_tensor(float(ic_val))
            ic_val = ic_val * torch.ones((xs.shape[0],))
            u = ((torch.sigmoid(t / torch.exp(self.log_scale)) - .5) * u
                 + ic_val.view(-1, 1))
        return u


def torch_train(model, residual_fn, total, niters, batch, lr,
                sampler=None, constraints=(), extra_params=()):
    """Reference-semantics training loop; returns per-iteration losses."""
    import torch

    params = [p for p in model.parameters() if p.requires_grad]
    params += [p for p in extra_params
               if p.requires_grad and not any(p is q for q in params)]
    opt = torch.optim.Adam(params, lr=lr)
    crit = torch.nn.MSELoss()
    losses = []
    for _ in range(niters):
        opt.zero_grad()
        if sampler is None:
            cols = [torch.rand((batch, 1), requires_grad=True)
                    for _ in range(total)]
        else:
            pts = torch.as_tensor(sampler(batch), dtype=torch.float32)
            cols = [pts[:, i:i + 1].clone().requires_grad_(True)
                    for i in range(total)]
        res = residual_fn(model, cols)
        loss = crit(res, torch.zeros_like(cols[0]))
        for c_fn in constraints:
            loss = loss + crit(c_fn(model), torch.tensor(0.0))
        loss.backward()
        opt.step()
        losses.append(loss.item())
    return losses


def torch_eval_residual_mse(model, residual_fn, eval_pts):
    import torch

    cols = [torch.as_tensor(eval_pts[:, i:i + 1]).clone().requires_grad_(True)
            for i in range(eval_pts.shape[1])]
    res = residual_fn(model, cols)
    return float((res ** 2).mean().item())


def tD(y, x):
    import torch
    return torch.autograd.grad(y.sum(), x, create_graph=True,
                               retain_graph=True)[0]


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------

def record(name, jax_side, torch_side, analytic=None):
    t0 = time.perf_counter()
    solver, j_losses = jax_side()
    j_time = time.perf_counter() - t0
    t0 = time.perf_counter()
    model, residual_fn, t_losses, eval_pts = torch_side()
    t_time = time.perf_counter() - t0

    j_final = float(np.mean(j_losses[-10:]))
    t_final = float(np.mean(t_losses[-10:]))
    j_eval = float(np.mean(solver.residual(eval_pts) ** 2))
    t_eval = torch_eval_residual_mse(model, residual_fn, eval_pts)
    row = {"workload": name,
           "final_train_loss": {"rebuild": round(j_final, 6),
                                "torch": round(t_final, 6)},
           "eval_residual_mse": {"rebuild": round(j_eval, 6),
                                 "torch": round(t_eval, 6)},
           "train_wall_s": {"rebuild": round(j_time, 2),
                            "torch": round(t_time, 2)}}
    if analytic is not None:
        j_err, t_err = analytic(solver, model)
        row["max_analytic_err"] = {"rebuild": round(float(j_err), 5),
                                   "torch": round(float(t_err), 5)}
    RESULTS.append(row)
    print(json.dumps(row), flush=True)


def w1_poisson():
    import pydens_tpu as pdt
    from pydens_tpu import Solver, D

    rng = np.random.default_rng(7)
    eval_pts = rng.uniform(size=(1024, 2)).astype(np.float32)

    def jax_side():
        def pde(f, x, y):
            return (D(D(f, x), x) + D(D(f, y), y)
                    - 5 * pdt.sin(np.pi * (x + y)))
        s = Solver(pde, ndims=2, boundary_condition=1, layout="fa fa fa f",
                   activation="Tanh", units=[10, 12, 15, 1], seed=0)
        s.fit(batch_size=100, niters=1500, progress=False, chunk_size=1500)
        return s, s.losses

    def torch_side():
        import torch
        torch.manual_seed(0)
        net = _torch_net([2, 10, 12, 15, 1], "Tanh")
        model = TorchAnsatz(net, ndims=2, bc=1.0)

        def residual_fn(m, cols):
            import torch as th
            u = m(th.cat(cols, dim=1))
            lap = sum(tD(tD(u, c), c) for c in cols)
            return lap - 5 * th.sin(np.pi * (cols[0] + cols[1]))

        losses = torch_train(model, residual_fn, 2, 1500, 100, 0.005,
                             extra_params=[model.log_scale])
        return model, residual_fn, losses, eval_pts

    record("poisson2d_readme", jax_side, torch_side)


def w2_ode_ic():
    import pydens_tpu as pdt
    from pydens_tpu import Solver, D

    xs_grid = np.linspace(0, 1, 100, dtype=np.float32)
    true = np.sin(2 * np.pi * xs_grid) + .5
    eval_pts = xs_grid.reshape(-1, 1)

    def jax_side():
        def ode(f, x):
            return D(f, x) - 2 * np.pi * pdt.cos(2 * np.pi * x)
        s = Solver(ode, ndims=1, initial_condition=.5, activation="Tanh",
                   layout="fafaf", features=[12, 10, 1], seed=0)
        s.fit(niters=500, batch_size=400, lr=0.02, progress=False)
        return s, s.losses

    def torch_side():
        import torch
        torch.manual_seed(0)
        net = _torch_net([1, 12, 10, 1], "Tanh")
        model = TorchAnsatz(net, ndims=1, ic=lambda: 0.5)

        def residual_fn(m, cols):
            import torch as th
            u = m(th.cat(cols, dim=1))
            return tD(u, cols[0]) - 2 * np.pi * th.cos(2 * np.pi * cols[0])

        losses = torch_train(model, residual_fn, 1, 500, 400, 0.02,
                             extra_params=[model.log_scale])
        return model, residual_fn, losses, eval_pts

    def analytic(solver, model):
        import torch
        j_err = np.max(np.abs(solver.predict(xs_grid).ravel() - true))
        with torch.no_grad():
            t_pred = model(torch.as_tensor(eval_pts)).numpy().ravel()
        return j_err, np.max(np.abs(t_pred - true))

    record("ode_ic", jax_side, torch_side, analytic)


def w3_heat():
    import pydens_tpu as pdt
    from pydens_tpu import Solver, D

    from pydens_tpu import NumpySampler as NS

    # Tutorial cells 38-40 exactly: x,y ~ U(0,1), t ~ U(0,.5), a ~ U(.1,4).
    rng = np.random.default_rng(7)
    eval_pts = np.stack([rng.uniform(size=1024), rng.uniform(size=1024),
                         rng.uniform(0, .5, size=1024),
                         rng.uniform(.1, 4, size=1024)],
                        axis=1).astype(np.float32)
    ic = lambda x, y: 10 * x * y * (1 - x) * (1 - y)

    def host_sampler(batch):
        r = np.random.rand(batch, 4)
        r[:, 2] *= .5
        r[:, 3] = .1 + 3.9 * r[:, 3]
        return r

    def jax_side():
        def pde(f, x, y, t, a):
            return D(D(f, x), x) + D(D(f, y), y) - a * D(f, t)
        s = Solver(pde, ndims=3, nparams=1, initial_condition=ic,
                   boundary_condition=0, layout="fafaf",
                   features=[30, 40, 1], activation="Sigmoid", seed=0)
        sampler = (NS("u", dim=2, seed=0) & NS("u", low=0, high=.5, seed=1)
                   & NS("u", low=.1, high=4, seed=2))
        s.fit(niters=1000, batch_size=1500, lr=0.001, sampler=sampler,
              progress=False)
        return s, s.losses

    def torch_side():
        import torch
        torch.manual_seed(0)
        net = _torch_net([4, 30, 40, 1], "Sigmoid")
        model = TorchAnsatz(net, ndims=3, ic=ic, bc=0.0)

        def residual_fn(m, cols):
            import torch as th
            u = m(th.cat(cols, dim=1))
            x, y, t, a = cols
            return tD(tD(u, x), x) + tD(tD(u, y), y) - a * tD(u, t)

        np.random.seed(0)
        losses = torch_train(model, residual_fn, 4, 1000, 1500, 0.001,
                             sampler=host_sampler,
                             extra_params=[model.log_scale])
        return model, residual_fn, losses, eval_pts

    record("heat_2d_plus_t", jax_side, torch_side)


def w4_parametric():
    import pydens_tpu as pdt
    from pydens_tpu import Solver, D, NumpySampler as NS

    xs_grid = np.linspace(0, 1, 60, dtype=np.float32)
    rng = np.random.default_rng(7)
    eval_pts = np.stack([rng.uniform(size=1024),
                         rng.uniform(.5, 5.5, size=1024)],
                        axis=1).astype(np.float32)

    def host_sampler(batch):
        r = np.random.rand(batch, 2)
        r[:, 1] = .5 + 5 * r[:, 1]
        return r

    def jax_side():
        def odeparam(f, x, e):
            return D(f, x) - e * np.pi * pdt.cos(e * np.pi * x)
        s = Solver(odeparam, ndims=1, initial_condition=2.0, nparams=1,
                   seed=0)
        sampler = NS("u", seed=0) & NS("u", low=.5, high=5.5, seed=1)
        # Tutorial cell 31 exactly: 7000 iterations.
        s.fit(niters=7000, batch_size=700, sampler=sampler, lr=0.01,
              progress=False)
        return s, s.losses

    def torch_side():
        import torch
        torch.manual_seed(0)
        net = _torch_net([2, 20, 30, 1], "Sigmoid")  # reference default net
        # ndims=1: the sampled parameter e (column 1) feeds the net but sits
        # outside the condition-binding ansatz, as in the reference.
        model = TorchAnsatz(net, ndims=1, ic=lambda: 2.0)

        def residual_fn(m, cols):
            import torch as th
            u = m(th.cat(cols, dim=1))
            x, e = cols
            return tD(u, x) - e * np.pi * th.cos(e * np.pi * x)

        np.random.seed(0)
        losses = torch_train(model, residual_fn, 2, 7000, 700, 0.01,
                             sampler=host_sampler,
                             extra_params=[model.log_scale])
        return model, residual_fn, losses, eval_pts

    def analytic(solver, model):
        import torch
        errs_j, errs_t = [], []
        for eps in (1.0, 2.0):
            true = np.sin(eps * np.pi * xs_grid) + 2
            errs_j.append(np.max(np.abs(
                solver.predict(xs_grid, eps).ravel() - true)))
            pts = np.stack([xs_grid, np.full_like(xs_grid, eps)], axis=1)
            with torch.no_grad():
                t_pred = model(torch.as_tensor(pts)).numpy().ravel()
            errs_t.append(np.max(np.abs(t_pred - true)))
        return max(errs_j), max(errs_t)

    record("parametric_ode_family", jax_side, torch_side, analytic)


def w5_inverse():
    import pydens_tpu as pdt
    from pydens_tpu import Solver, D, V

    eval_pts = np.linspace(0, 1, 128, dtype=np.float32).reshape(-1, 1)

    def jax_side():
        def odevar(f, x):
            return (D(f, x) - 2 * np.pi * pdt.cos(2 * np.pi * x)
                    + V("new_var", data=np.array([1.0])))
        s = Solver(odevar, ndims=1, initial_condition=1,
                   constraints=lambda f, x: f(np.array([0.5])), seed=0)
        s.model.freeze_trainable(variables=("new_var",))
        s.fit(niters=400, batch_size=500, lr=0.1, progress=False)
        s.model.unfreeze_trainable(variables=["new_var"])
        s.fit(niters=300, batch_size=100, lr=0.1,
              loss_terms=["equation", "constraint_0"], progress=False)
        s._recovered = float(
            np.asarray(s.params["variables"]["new_var"]).ravel()[0])
        return s, s.losses

    def torch_side():
        import torch
        torch.manual_seed(0)
        net = _torch_net([1, 20, 30, 1], "Sigmoid")
        model = TorchAnsatz(net, ndims=1, ic=lambda: 1.0)
        new_var = torch.nn.Parameter(torch.tensor([1.0]))

        def residual_fn(m, cols):
            import torch as th
            u = m(th.cat(cols, dim=1))
            return (tD(u, cols[0])
                    - 2 * np.pi * th.cos(2 * np.pi * cols[0]) + new_var)

        def constraint(m):
            return m(torch.tensor([[0.5]])).squeeze()

        new_var.requires_grad = False
        l1 = torch_train(model, residual_fn, 1, 400, 500, 0.1,
                         extra_params=[model.log_scale])
        new_var.requires_grad = True
        l2 = torch_train(model, residual_fn, 1, 300, 100, 0.1,
                         constraints=[constraint],
                         extra_params=[model.log_scale, new_var])
        model._recovered = float(new_var.detach().item())
        return model, residual_fn, l1 + l2, eval_pts

    def analytic(solver, model):
        # closed form: constraint f(0.5)=0 forces new_var -> 2
        return abs(solver._recovered - 2.0), abs(model._recovered - 2.0)

    record("inverse_v_token", jax_side, torch_side, analytic)


def main():
    for w in (w1_poisson, w2_ode_ic, w3_heat, w4_parametric, w5_inverse):
        w()
    # markdown table for BENCHMARKS.md
    print("\n| workload | final train loss (rebuild / torch) "
          "| eval residual MSE (rebuild / torch) | max analytic err "
          "(rebuild / torch) |")
    print("|---|---|---|---|")
    for r in RESULTS:
        a = r.get("max_analytic_err")
        print("| {} | {} / {} | {} / {} | {} |".format(
            r["workload"],
            r["final_train_loss"]["rebuild"], r["final_train_loss"]["torch"],
            r["eval_residual_mse"]["rebuild"],
            r["eval_residual_mse"]["torch"],
            f'{a["rebuild"]} / {a["torch"]}' if a else "—"))


if __name__ == "__main__":
    main()
