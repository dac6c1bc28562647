from speakerverification_tpu.ops.frontend import (  # noqa: F401
    FrontendConfig,
    hz_to_mel,
    make_frontend,
    mel_filterbank,
    mel_to_hz,
    pre_emphasis,
)
