from specdec_tpu.ngram.storage import (
    INgramStorage,
    NGramStorage,
    OneLevelNGramStorage,
)
from specdec_tpu.ngram.assisted import ngram_assisted_speculative_generate
