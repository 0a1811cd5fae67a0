from .convert import int_to_limbs, ints_to_limbs, limbs_to_int, limbs_to_ints

__all__ = ["int_to_limbs", "ints_to_limbs", "limbs_to_int", "limbs_to_ints"]
