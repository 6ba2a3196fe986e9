"""Serving runtime: result cache, simulation workers, GraphQL API."""
