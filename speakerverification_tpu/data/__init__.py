from speakerverification_tpu.data.audio import AudioSpec, load_wav  # noqa: F401
from speakerverification_tpu.data.augment import AugmentWav  # noqa: F401
from speakerverification_tpu.data.loader import (  # noqa: F401
    EvalDataLoader,
    TrainDataLoader,
    train_data_loader,
)
from speakerverification_tpu.data.manifest import Manifest, generate_metadata  # noqa: F401
from speakerverification_tpu.data.sampler import SpeakerBatchSampler  # noqa: F401
from speakerverification_tpu.data.wavio import read_wav, write_wav  # noqa: F401
