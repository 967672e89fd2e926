"""Serving: artifact-backed recommend service, HTTP API, meal-plan app."""
