from obia_tpu.detection.models import *  # noqa: F401,F403
import obia_tpu.detection.models as _impl
import sys as _sys
# expose everything, including underscore-prefixed API the reference exports
for _n in dir(_impl):
    if not _n.startswith("__"):
        setattr(_sys.modules[__name__], _n, getattr(_impl, _n))
