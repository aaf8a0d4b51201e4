from fedrann_tpu.project.srp import build_precompute, icf_weights_device  # noqa: F401
from fedrann_tpu.project.embed import embed_hits  # noqa: F401
