from .components import constrain, init_raw_params, inv_softplus, softplus  # noqa: F401
from .exact_gp import DenseGP, SimplexGP  # noqa: F401
from .sgpr import SGPR  # noqa: F401
from .ski import SKIP  # noqa: F401
