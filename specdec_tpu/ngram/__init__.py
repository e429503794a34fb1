from specdec_tpu.ngram.storage import (
    INgramStorage,
    NGramStorage,
    OneLevelNGramStorage,
)
from specdec_tpu.ngram.assisted import (
    batch_ngram_assisted_generate,
    ngram_assisted_speculative_generate,
)
