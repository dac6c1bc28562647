from speakerverification_tpu.evaluation.bank import (  # noqa: F401
    ShardedSpeakerBank,
    SpeakerBank,
    identify_with_bank,
)
from speakerverification_tpu.evaluation.metrics import (  # noqa: F401
    accuracy,
    compute_error_rates,
    compute_min_dcf,
    precision_recall_curve,
    roc_curve,
    tune_threshold_from_score,
)
