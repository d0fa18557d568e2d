from . import box_ops, losses  # noqa: F401
from .msda import ms_deform_attn  # noqa: F401
from .assignment import hungarian  # noqa: F401
