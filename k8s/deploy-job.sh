#!/bin/bash
# graft deploy script — mirrors the reference's deploy-job.sh
# (topics -> jobs -> wait), for Spark-on-K8s via the Kubeflow Spark
# Operator instead of the Flink operator.
#
# Prereqs (the create-infra.sh analog):
#   kubectl create namespace graft kafka || true
#   helm install spark-operator spark-operator/spark-operator -n graft
#   kubectl apply -f https://strimzi.io/install/latest?namespace=kafka -n kafka
#   kubectl apply -f <a Strimzi Kafka CR>  # e.g. kafka-single-node
#   kubectl create serviceaccount graft-spark -n graft  # + RBAC per operator docs
#
# With no cluster reachable (CI, the build sandbox), runs the config
# SMOKE instead: client-side dry-run when kubectl exists, else a pure
# YAML parse/shape lint — so the manifests stay machine-checked even
# where nothing can be applied.
set -e
cd "$(dirname "$0")"

lint() {
  echo "-- config smoke (no cluster): linting manifests --"
  # --validate=false: schema validation needs an apiserver; the
  # client-side dry-run still parses and shapes every document.
  # The dry-run is an ADDITIONAL check, never a substitute: the
  # python rules below (mainClass exists in source, durable
  # checkpoint) are things no kubectl dry-run can see, so they run
  # unconditionally.
  if command -v kubectl >/dev/null 2>&1; then
    kubectl apply --dry-run=client --validate=false \
      -f topics/graft-topics.yaml -f graft-job.yaml 2>/dev/null || true
  fi
  python3 - <<'EOF'
import glob, sys, yaml
ok = True
# a crash-looping driver is the one failure the dry-run can't see:
# every graft mainClass must be a real object in the repo's source
srcs = {f: open(f).read() for f in glob.glob("../src/main/scala/**/*.scala",
                                            recursive=True)}
for path in ["topics/graft-topics.yaml", "graft-job.yaml"]:
    for i, doc in enumerate(yaml.safe_load_all(open(path))):
        if doc is None:
            continue
        for key in ("apiVersion", "kind", "metadata", "spec"):
            if key not in doc:
                print(f"FAIL {path}[{i}]: missing {key}"); ok = False
        name = doc.get("metadata", {}).get("name", "?")
        if doc.get("kind") == "SparkApplication":
            spec = doc["spec"]
            for key in ("mainClass", "mainApplicationFile", "sparkVersion",
                        "driver", "executor", "restartPolicy"):
                if key not in spec:
                    print(f"FAIL {path}[{i}] {name}: missing spec.{key}"); ok = False
            mc = spec.get("mainClass", "")
            if mc.startswith("graft."):
                pkg, cls = mc.rsplit(".", 1)
                # the object must exist in a file declaring the SAME
                # package — right name in the wrong package still
                # crash-loops on ClassNotFoundException
                import re
                found = any(
                    re.search(rf"^package {re.escape(pkg)}\s*$", body, re.M)
                    and re.search(rf"\bobject {re.escape(cls)}\b", body)
                    for body in srcs.values())
                if not found:
                    print(f"FAIL {path}[{i}] {name}: mainClass {mc} not found "
                          f"in src/main/scala — driver would crash-loop on "
                          f"ClassNotFoundException"); ok = False
            ckpt = spec.get("sparkConf", {}).get(
                "spark.sql.streaming.checkpointLocation", "")
            if not (ckpt.startswith("s3a://") or ckpt.startswith("hdfs://")):
                print(f"FAIL {path}[{i}] {name}: checkpoint must be durable "
                      f"shared storage, got '{ckpt}'"); ok = False
        print(f"ok {path}[{i}]: {doc.get('kind')}/{name}")
sys.exit(0 if ok else 1)
EOF
  echo "-- smoke OK --"
}

if ! command -v kubectl >/dev/null 2>&1 || ! kubectl cluster-info >/dev/null 2>&1; then
  lint
  exit 0
fi

# lint BEFORE touching the cluster — a bad manifest should fail here,
# not after a partial apply
lint

echo "Ensuring topics exist..."
kubectl apply -f topics/graft-topics.yaml

echo "(Re-)creating graft streaming jobs..."
kubectl apply -f graft-job.yaml

echo "Waiting for drivers..."
for job in graft-event-processor graft-aggregation graft-event-producer; do
  # poll-wrap the jsonpath wait: until the operator first reconciles,
  # .status.applicationState doesn't exist, and kubectl < 1.31 errors
  # out on a missing jsonpath instead of polling
  ok=""
  for _ in $(seq 1 36); do
    if kubectl wait --for=jsonpath='{.status.applicationState.state}'=RUNNING \
        --timeout=5s "sparkapplication/$job" -n graft 2>/dev/null; then
      ok=1; break
    fi
    sleep 5
  done
  if [ -z "$ok" ]; then
    echo "FAIL: $job did not reach RUNNING within 360s" >&2
    kubectl get "sparkapplication/$job" -n graft -o yaml | tail -20 >&2
    exit 1
  fi
done
echo "All graft jobs running."
