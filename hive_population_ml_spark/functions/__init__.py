from .rowwise import rowwise_mean, rowwise_present, rowwise_sum

__all__ = ["rowwise_mean", "rowwise_present", "rowwise_sum"]
