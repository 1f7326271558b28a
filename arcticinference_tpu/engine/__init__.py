from arcticinference_tpu.engine.request import (Request, RequestStatus,
                                                SamplingParams)
from arcticinference_tpu.engine.engine import LLMEngine

__all__ = ["Request", "RequestStatus", "SamplingParams", "LLMEngine"]
