from specdec_tpu.serve.scheduler import ContinuousBatcher, Request
