from speakerverification_tpu.training.state import TrainState, create_train_state  # noqa: F401
from speakerverification_tpu.training.train_step import make_eval_embed_fn, make_train_step  # noqa: F401
