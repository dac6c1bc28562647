"""Model zoo: encoders registered under their reference YAML names.

Parity with the reference's dynamic-import factory protocol
(src/model.py:70-73: every model file exposes ``MainModel(nOut, **kwargs)``).
Here each encoder registers a builder in ``MODELS`` keyed by the same name
a reference YAML would use (``model.name``).
"""

import speakerverification_tpu.models.conformer  # noqa: F401
import speakerverification_tpu.models.ecapa_tdnn  # noqa: F401
import speakerverification_tpu.models.hybrids  # noqa: F401
import speakerverification_tpu.models.hybrids2  # noqa: F401
import speakerverification_tpu.models.image_encoders  # noqa: F401
import speakerverification_tpu.models.next  # noqa: F401
import speakerverification_tpu.models.rawnet2  # noqa: F401
import speakerverification_tpu.models.rawnet2_custom  # noqa: F401
import speakerverification_tpu.models.rawnet3  # noqa: F401
import speakerverification_tpu.models.resnetse  # noqa: F401
import speakerverification_tpu.models.senet  # noqa: F401
import speakerverification_tpu.models.titanet  # noqa: F401
from speakerverification_tpu.models.ecapa_tdnn import ECAPA_TDNN  # noqa: F401
from speakerverification_tpu.registry import MODELS


def build_model(name: str, nOut: int, **kwargs):
    """Instantiate an encoder by its reference YAML name."""
    return MODELS.get(name)(nOut=nOut, **kwargs)
