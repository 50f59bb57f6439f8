"""Protocol conformance + seam rejection (reference tests/test_protocols.py:19-186
and test_pfb_solver.py wiring checks)."""

import numpy as np
import pytest

from pfb_imaging_tpu.ops import LinearOperator, Preconditioner, PsiOperator, require_protocol
from pfb_imaging_tpu.ops.hessian import HessianCube
from pfb_imaging_tpu.ops.identity_psi import IdentityPsi
from pfb_imaging_tpu.ops.mask import Mask
from pfb_imaging_tpu.ops.psi import Psi
from pfb_imaging_tpu.opt import BackwardSolver, ForwardSolver
from pfb_imaging_tpu.opt.forward_backward import ForwardBackward
from pfb_imaging_tpu.opt.pcg import PCG
from pfb_imaging_tpu.opt.primal_dual import PrimalDual
from pfb_imaging_tpu.deconv import DeconvSolver, Regulariser
from pfb_imaging_tpu.deconv.pfb import PFBSolver
from pfb_imaging_tpu.prox import L1, L21


def test_operator_protocols():
    hc = HessianCube.build(np.zeros((1, 1, 8, 5)), np.ones(1), 0.0, 8, 8)
    assert isinstance(hc, LinearOperator)
    assert isinstance(Mask(np.ones((4, 4))), LinearOperator)
    assert isinstance(Psi(1, 16, 16, bases=("self", "db1"), nlevel=1), PsiOperator)
    assert isinstance(IdentityPsi(1, 4, 4), PsiOperator)


def test_solver_protocols():
    assert isinstance(PCG(), ForwardSolver)
    assert isinstance(PrimalDual(), BackwardSolver)
    assert isinstance(ForwardBackward(), BackwardSolver)


def test_regulariser_protocols():
    psi = IdentityPsi(1, 4, 4)
    assert isinstance(L21(psi, ("self",)), Regulariser)
    assert isinstance(L1(psi), Regulariser)


def test_require_protocol_rejects():
    class NotAnOp:
        pass

    with pytest.raises(TypeError, match="does not satisfy"):
        require_protocol(NotAnOp(), LinearOperator, "hess")
    with pytest.raises(TypeError):
        require_protocol(NotAnOp(), Preconditioner)


def test_pfbsolver_rejects_bad_wiring():
    psi = IdentityPsi(1, 4, 4)
    reg = L1(psi)

    class BadHess:
        pass

    with pytest.raises(TypeError):
        PFBSolver(BadHess(), PCG(), ForwardBackward(), reg, model=np.zeros((1, 4, 4)), update=np.zeros((1, 4, 4)))


def test_pfbsolver_satisfies_deconv_protocol():
    hc = HessianCube.build(np.abs(np.random.default_rng(0).standard_normal((1, 1, 8, 5))), np.ones(1), 1e-3, 8, 8)
    psi = IdentityPsi(1, 4, 4)
    reg = L1(psi)
    s = PFBSolver(hc, PCG(maxit=5, minit=1), ForwardBackward(maxit=5), reg,
                  model=np.zeros((1, 4, 4)), update=np.zeros((1, 4, 4)), hessnorm=1.0)
    assert isinstance(s, DeconvSolver)
    # lifecycle ordering enforced
    with pytest.raises(RuntimeError, match="residual not set"):
        s.forward(None)
