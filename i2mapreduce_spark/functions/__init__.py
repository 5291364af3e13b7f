from .vector import l2_norm_expr, l2_norm_oracle_sql  # noqa: F401
