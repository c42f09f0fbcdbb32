from .scores import (  # noqa: F401
    lgl_col,
    lgl_py,
    lmi_col,
    lmi_py,
    npmi_col,
    npmi_py,
    score_columns,
    tscore_col,
    tscore_py,
    zscore_col,
    zscore_py,
)
