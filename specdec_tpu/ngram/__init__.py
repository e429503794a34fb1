from specdec_tpu.ngram.storage import (
    INgramStorage,
    NGramStorage,
    OneLevelNGramStorage,
)
from specdec_tpu.ngram.assisted import (
    batch_ngram_assisted_generate,
    ngram_assisted_speculative_generate,
)
from specdec_tpu.ngram.device_table import (
    DeviceNGramTable,
    init_device_table,
)
from specdec_tpu.ngram.device_assisted import (
    device_ngram_assisted_generate,
    device_ngram_assisted_generate_batch,
)
