from . import repos, wal_gen  # noqa: F401
from .repos import gen_repos_base  # noqa: F401
