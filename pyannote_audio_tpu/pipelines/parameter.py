"""Re-export of the hyperparameter types (canonical home: core.parameter).

Kept under ``pipelines`` for API parity with the reference's
``pyannote.pipeline.parameter`` import path.
"""

from ..core.parameter import (Categorical, Frozen, Integer, LogUniform,
                              ParamDict, Parameter, Uniform)

__all__ = ["Categorical", "Frozen", "Integer", "LogUniform", "ParamDict",
           "Parameter", "Uniform"]
