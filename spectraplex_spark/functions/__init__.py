from spectraplex_spark.functions.ids import deterministic_id
from spectraplex_spark.functions.money import lamports_to_sol, to_money

__all__ = ["deterministic_id", "lamports_to_sol", "to_money"]
