from specdec_tpu.serve.nasd_scheduler import NasdContinuousBatcher
from specdec_tpu.serve.scheduler import ContinuousBatcher, Request
