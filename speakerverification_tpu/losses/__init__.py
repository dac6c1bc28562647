"""Loss zoo.

Contract parity with the reference (src/model.py:82-94): each loss is a
Flax module called as ``loss(x, label) -> (loss, prec1)`` where ``x`` is
``[B, nPerSpeaker, D]`` (or ``[B, D]`` for pure classification losses) and
``prec1`` is top-1 accuracy in percent; each class carries a
``test_normalize`` attribute deciding embedding L2-normalization at eval.
Losses are registered under their reference YAML names
(yaml/configuration.yaml `criterion.name`).
"""

from speakerverification_tpu.losses.margin import (  # noqa: F401
    AAmSoftmax,
    AmSoftmax,
    Softmax,
)
from speakerverification_tpu.losses.proto import (  # noqa: F401
    AngularProto,
    GE2ELoss,
    Prototypical,
)
from speakerverification_tpu.losses.combined import (  # noqa: F401
    AAmSoftmaxAP,
    AAmSoftmaxProto,
    AmSoftmaxProto,
    SoftmaxAngularProto,
)
from speakerverification_tpu.losses.sharded import (  # noqa: F401
    ShardedAAmSoftmax,
)
import speakerverification_tpu.losses.adaptive  # noqa: F401
import speakerverification_tpu.losses.margin_extra  # noqa: F401
import speakerverification_tpu.losses.proxy  # noqa: F401
import speakerverification_tpu.losses.similarity  # noqa: F401
import speakerverification_tpu.losses.triplet  # noqa: F401
from speakerverification_tpu.registry import LOSSES


def build_loss(name: str, **kwargs):
    return LOSSES.get(name)(**_filter_kwargs(name, kwargs))


def _filter_kwargs(name: str, kwargs: dict) -> dict:
    import dataclasses
    cls = LOSSES.get(name)
    fields = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in kwargs.items() if k in fields}
