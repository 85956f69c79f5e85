.PHONY: test bench docs build up exec down

test:
	python -m pytest tests/ -q

bench:
	python bench.py

docs:
	python tools/build_docs.py

build:
	docker compose -f docker/docker-compose.yaml build

up:
	docker compose -f docker/docker-compose.yaml up -d

exec:
	docker exec -it ccvm-tpu bash

down:
	docker compose -f docker/docker-compose.yaml down --remove-orphans
