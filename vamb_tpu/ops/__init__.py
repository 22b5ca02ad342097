"""Device-side ops: TNF projection, kernel generation, clustering kernels."""

from .kernel import load_tnf_kernel, create_dual_kernel
from .tnf import project_fourmers

__all__ = ["load_tnf_kernel", "create_dual_kernel", "project_fourmers"]
