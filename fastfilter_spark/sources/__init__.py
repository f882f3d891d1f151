from .membership_source import FFSKMembershipDataSource, register_sources

__all__ = ["FFSKMembershipDataSource", "register_sources"]
