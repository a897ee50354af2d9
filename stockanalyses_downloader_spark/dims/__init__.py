from .currency import currency_dim, currency_values_sql  # noqa: F401
