"""Kubernetes pod-discovery catalog provider (SURVEY §2.1 S4, §2.2 P6/P7).

The reference pages ``list_pod_for_all_namespaces`` (50 pods/page via
``_continue`` tokens) with label/field selectors pushed to the API
server — ``status.phase=Running`` always forced — then keeps pods whose
annotations enable Jolokia and derives (server_type, url) pairs
(reference Code/KubernetesAutomator.py:98-125,64-79,16-32).

Here discovery is a driver-side catalog refresh (catalog-sized data,
re-evaluated per trigger like the reference's per-cycle rebuild,
Code/main.py:274-282).  The k8s client is optional — this container
doesn't ship it — so the pod lister is pluggable; ``pods_to_catalog``
holds all the filter/derive logic and is fully tested on plain dicts
(FIXTURES.md §4).
"""

from __future__ import annotations

from collections.abc import Iterable

ANN_ENABLED = "jolokia/is_enabled"
ANN_PORT = "jolokia/port"
ANN_SERVER_TYPE = "jolokia/server_type"
DEFAULT_SERVER_TYPE = "Discovered"  # reference Code/KubernetesAutomator.py:67-68


def build_selectors(
    label_selectors: dict[str, str] | None = None,
    field_selectors: dict[str, str] | None = None,
) -> tuple[str, str]:
    """P7: ``k=v,k=v`` selector strings pushed to the K8s API server;
    ``status.phase=Running`` is always forced
    (reference Code/KubernetesAutomator.py:16-18,30-32)."""
    fields = dict(field_selectors or {})
    fields["status.phase"] = "Running"
    fmt = lambda d: ",".join(f"{k}={v}" for k, v in d.items())  # noqa: E731
    return fmt(label_selectors or {}), fmt(fields)


def pods_to_catalog(
    pods: Iterable[dict],
    enabled_annotation: str = ANN_ENABLED,
    port_annotation: str = ANN_PORT,
    server_type_annotation: str = ANN_SERVER_TYPE,
) -> dict[str, list[str]]:
    """P6: annotation-gated pod → scrape-target derivation.

    pod dict shape (FIXTURES.md §4): {pod_ip, phase, annotations}.
    Returns {server_type: [url, ...]} merged like the reference's
    add_server_to_fetch_list (Code/KubernetesAutomator.py:64-79).
    The annotation NAMES are configurable like the reference's
    ``--jmx-k8s-jolokia-*-annotation`` flags (Code/main.py:124-129);
    the port rides a ``jolokia/port`` annotation here rather than the
    reference's pod-spec port-NAME matcher — a documented divergence
    (the pod spec is not part of the catalog fixture shape)."""
    out: dict[str, list[str]] = {}
    for pod in pods:
        ann = pod.get("annotations") or {}
        if pod.get("phase") != "Running":
            continue
        if enabled_annotation not in ann or port_annotation not in ann:
            continue
        server_type = ann.get(server_type_annotation) or DEFAULT_SERVER_TYPE
        url = f"http://{pod['pod_ip']}:{ann[port_annotation]}"
        out.setdefault(server_type, []).append(url)
    return out


def merge_server_lists(
    cli: dict[str, list[str]], discovered: dict[str, list[str]]
) -> dict[str, list[str]]:
    """J3/O2/O3: CLI-provided ∪ K8s-discovered server lists per type;
    extra discovered types appended (reference Code/main.py:48-69)."""
    merged = {k: list(v) for k, v in cli.items()}
    for server_type, urls in discovered.items():
        merged.setdefault(server_type, [])
        merged[server_type] = list(dict.fromkeys(merged[server_type] + urls))
    return merged


def discover_pods_k8s(
    label_selectors: dict[str, str] | None = None,
    field_selectors: dict[str, str] | None = None,
    page_size: int = 50,
    context: str | None = None,
) -> list[dict]:
    """Live discovery via the kubernetes client, paginated like the
    reference (50/page, ``_continue`` token;
    Code/KubernetesAutomator.py:98-125).  ``context`` picks the
    kube-config context (``--jmx-k8s-context``, Code/main.py:122-123;
    ignored in-cluster, where the injected service account wins).
    Degrades to [] when the client or cluster is unavailable
    (reference README.md:190)."""
    try:
        from kubernetes import client, config  # type: ignore[import-not-found]
    except ImportError:
        return []
    try:
        try:
            config.load_incluster_config()
        except Exception:  # noqa: BLE001
            config.load_kube_config(context=context)
        v1 = client.CoreV1Api()
    except Exception:  # noqa: BLE001
        return []

    label_sel, field_sel = build_selectors(label_selectors, field_selectors)
    pods: list[dict] = []
    cont = None
    while True:
        resp = v1.list_pod_for_all_namespaces(
            limit=page_size,
            _continue=cont,
            label_selector=label_sel,
            field_selector=field_sel,
        )
        for item in resp.items:
            pods.append(
                {
                    "pod_name": item.metadata.name,
                    "namespace": item.metadata.namespace,
                    "pod_ip": item.status.pod_ip,
                    "phase": item.status.phase,
                    "annotations": item.metadata.annotations or {},
                }
            )
        cont = resp.metadata._continue  # noqa: SLF001
        if not cont:
            return pods
