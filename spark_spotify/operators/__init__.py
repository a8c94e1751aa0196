from spark_spotify.operators.merge import merge_upsert

__all__ = ["merge_upsert"]
