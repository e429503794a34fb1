from specdec_tpu.sampling.processors import (
    LogitsProcessor,
    GreedyProcessor,
    MultinomialProcessor,
    TopKProcessor,
    NucleusProcessor,
    TopKNucleusProcessor,
    build_processor,
)
from specdec_tpu.sampling.tree_speculative import (
    TreeTopology,
    tree_speculative_generate,
)
from specdec_tpu.sampling.eagle_speculative import eagle_generate
from specdec_tpu.sampling.eagle_tree import eagle_tree_generate
