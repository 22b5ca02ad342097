"""torch DAdaptAdam shim implementing decoupled D-Adaptation Adam.

Transcribed from this repo's validated numpy oracle
(tests/test_optim.py::NumpyDAdaptAdamOracle — itself lockstep-verified
against vamb_tpu/optim/dadapt.py), NOT from the pip `dadaptation` package.
Update rule (Defazio & Mishchenko, ICML 2023; decouple=True):

    dlr   = d * lr
    num  += dlr * <g, s / (sqrt(v)+eps)>          (with PREVIOUS s, v)
    m'    = b1*m + (1-b1)*dlr*g
    v'    = b2*v + (1-b2)*g*g
    s'    = sqrt(b2)*s + (1-sqrt(b2))*dlr*g
    numw' = sqrt(b2)*numw + (1-sqrt(b2))*num
    d'    = max(d, numw' / ((1-sqrt(b2))*||s'||_1))   if ||s'||_1 > 0
    p'    = p - m'/(sqrt(v')+eps) - decay*dlr*p       (decoupled decay)

The reference instantiates `DAdaptAdam(params, decouple=True)` at
vamb/encode.py:578 and `(params, lr=1, decouple=True)` at
taxvamb_encode.py:387,1074.
"""

import math

import torch


class DAdaptAdam(torch.optim.Optimizer):
    def __init__(
        self,
        params,
        lr: float = 1.0,
        betas=(0.9, 0.999),
        eps: float = 1e-8,
        weight_decay: float = 0.0,
        d0: float = 1e-6,
        growth_rate: float = float("inf"),
        decouple: bool = False,
        **_ignored,
    ):
        defaults = dict(
            lr=lr,
            betas=betas,
            eps=eps,
            weight_decay=weight_decay,
        )
        super().__init__(params, defaults)
        self._d = d0
        self._numerator_weighted = 0.0
        self._growth_rate = growth_rate
        self._decouple = decouple

    @torch.no_grad()
    def step(self, closure=None):
        loss = None
        if closure is not None:
            with torch.enable_grad():
                loss = closure()

        group0 = self.param_groups[0]
        lr = group0["lr"]
        b1, b2 = group0["betas"]
        sqrt_b2 = math.sqrt(b2)
        eps = group0["eps"]
        dlr = self._d * lr

        numerator_acum = 0.0
        sk_l1 = 0.0
        for group in self.param_groups:
            for p in group["params"]:
                if p.grad is None:
                    continue
                g = p.grad
                state = self.state[p]
                if len(state) == 0:
                    state["m"] = torch.zeros_like(p)
                    state["v"] = torch.zeros_like(p)
                    state["s"] = torch.zeros_like(p)
                m, v, s = state["m"], state["v"], state["s"]
                denom = v.sqrt().add_(eps)
                numerator_acum += float(dlr * torch.sum(g * (s / denom)))
                m.mul_(b1).add_(g, alpha=(1 - b1) * dlr)
                v.mul_(b2).addcmul_(g, g, value=1 - b2)
                s.mul_(sqrt_b2).add_(g, alpha=(1 - sqrt_b2) * dlr)
                sk_l1 += float(s.abs().sum())

        self._numerator_weighted = (
            sqrt_b2 * self._numerator_weighted + (1 - sqrt_b2) * numerator_acum
        )
        if sk_l1 > 0 and lr > 0:
            d_hat = self._numerator_weighted / ((1 - sqrt_b2) * sk_l1)
            self._d = max(self._d, min(d_hat, self._d * self._growth_rate))

        for group in self.param_groups:
            decay = group["weight_decay"]
            for p in group["params"]:
                if p.grad is None:
                    continue
                state = self.state[p]
                m, v = state["m"], state["v"]
                denom = v.sqrt().add_(eps)
                p.addcdiv_(m, denom, value=-1.0)
                if decay != 0 and self._decouple:
                    p.add_(p, alpha=-decay * dlr)
        return loss
