"""Force-map optimizers: uniform aggregation, linear QP, featurized, noised."""
# ruff: noqa: F401
from .qplinear import (
    qp_linear_map,
    qp_form,
    make_bond_constraint_matrix,
    SolverOptions,
    DEFAULT_SOLVER_OPTIONS,
)
from .basicagg import constraint_aware_uni_map
from .featlinearmap import (
    FeatZipper,
    Multifeaturize,
    GeneralizedFeatures,
    GeneralizedFeaturizer,
    qp_feat_linear_map,
    id_feat,
    multifeaturize,
)
from .jaxfeat import gb_feat
from .jgauss import (
    joptgauss_map,
    stagedjoptgauss_map,
    stagedjslicegauss_map,
    stagedjforcegauss_map,
)
