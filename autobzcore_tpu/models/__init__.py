from .tight_binding import integer_lattice, tb_graphene, tb_integer

__all__ = ["integer_lattice", "tb_graphene", "tb_integer"]
