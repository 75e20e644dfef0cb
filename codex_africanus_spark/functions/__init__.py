from codex_africanus_spark.functions.complex_algebra import (  # noqa: F401
    Cplx,
    cexp_i,
    clit,
)
