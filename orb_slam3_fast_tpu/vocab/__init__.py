from orb_slam3_fast_tpu.vocab.database import KeyFrameDatabase
from orb_slam3_fast_tpu.vocab.vocabulary import (
    Vocabulary,
    default_vocabulary,
    score_l1,
    train,
    transform,
    transform_words,
)

__all__ = [
    "KeyFrameDatabase",
    "Vocabulary",
    "default_vocabulary",
    "score_l1",
    "train",
    "transform",
    "transform_words",
]
