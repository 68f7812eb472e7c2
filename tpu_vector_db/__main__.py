"""``python -m tpu_vector_db [development|production]`` — serve the REST API."""

from tpu_vector_db.api.main import main

if __name__ == "__main__":
    main()
