from .backbone import Backbone  # noqa: F401
from .detr import DETR  # noqa: F401
from .deformable_detr import DeformableDETR  # noqa: F401

try:  # factory pulls in matcher/criterion; keep partial imports working
    from .factory import build_model  # noqa: F401
except ImportError:  # pragma: no cover - during incremental construction
    pass
