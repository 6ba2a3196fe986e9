"""GraphQL API (reference: graphql_schema.py + graphql_backend.py).

Graphene/Flask are not available in this environment, so the package
ships a small spec-subset GraphQL engine (lexer, parser, executor in
``engine.py``) plus the REINA schema (``schema.py``) and a stdlib HTTP
server (``server.py``). The query/mutation surface matches the
reference one-to-one so the reina-ui Next.js frontend keeps working.
"""

from .engine import GraphQLError, execute, parse  # noqa: F401
from .schema import SCHEMA  # noqa: F401
