"""Assembly: local (per-element, batched) and global (scatter into CSR)."""

from . import global_ as global_assembly
from . import local
from .local import (
    Tabulation,
    assemble_element_elliptic_matrices,
    assemble_element_elliptic_vectors,
    assemble_element_mass_matrices,
    assemble_element_source_vectors,
    compute_element_elliptic_energy,
    tabulate,
)
from .global_ import (
    CsrPattern,
    apply_homogeneous_dirichlet_bc_csr,
    apply_homogeneous_dirichlet_bc_rhs,
    assemble_csr,
    assemble_scalar,
    assemble_vector,
    csr_pattern,
)
