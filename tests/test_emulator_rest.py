"""Live Pub/Sub-emulator tier over the REST surface (stdlib only).

The gRPC tier (``test_emulator_integration.py``) requires
``google-cloud-pubsub``, which this container does not ship and may
not install — so it has never executed live. The emulator itself IS
present (gcloud's ``pubsub-emulator`` component, started with
``gcloud beta emulators pubsub start --host-port=127.0.0.1:8085``),
and it serves the public REST API on the same port; this module
exercises the live service contract through ``urllib`` alone:

  - publish → pull → ack lifecycle with exact byte/attribute fidelity
    (the S8/S14 round-trip the connector's decode/encode rests on);
  - nack (modifyAckDeadline 0) → redelivery (the S11 at-least-once
    contract FileBroker mirrors with lease expiry);
  - ordering-key publish order preserved on an ordering-enabled
    subscription (S16; reference ``PubsubSink.scala`` ordering path).

Skips cleanly when ``PUBSUB_EMULATOR_HOST`` is unset. Against the
reference: these are the broker-dependent halves of the emulator
scenarios in ``PubsubConnectorTest.scala:117-291``, run against the
same emulator the reference's ``pom.xml:213-282`` container starts.
"""

from __future__ import annotations

import base64
import json
import os
import urllib.request
import uuid

import pytest

HOST = os.environ.get("PUBSUB_EMULATOR_HOST")
if not HOST:
    pytest.skip(
        "PUBSUB_EMULATOR_HOST not set; start an emulator to run this tier",
        allow_module_level=True,
    )

PROJECT = "emu-project"
BASE = f"http://{HOST}/v1/projects/{PROJECT}"


def _call(method: str, path: str, body: dict | None = None) -> dict:
    req = urllib.request.Request(
        f"{BASE}/{path}",
        method=method,
        data=json.dumps(body).encode() if body is not None else None,
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=30) as resp:
        payload = resp.read()
    return json.loads(payload) if payload else {}


def _mk_pair(ordering: bool = False) -> tuple[str, str]:
    run = uuid.uuid4().hex[:8]
    topic, sub = f"t-{run}", f"s-{run}"
    _call("PUT", f"topics/{topic}")
    body = {
        "topic": f"projects/{PROJECT}/topics/{topic}",
        "ackDeadlineSeconds": 600,
    }
    if ordering:
        body["enableMessageOrdering"] = True
    _call("PUT", f"subscriptions/{sub}", body)
    return topic, sub


def _publish(topic: str, msgs: list[dict]) -> list[str]:
    return _call("POST", f"topics/{topic}:publish", {"messages": msgs}).get(
        "messageIds", []
    )


def _pull(sub: str, n: int) -> list[dict]:
    return _call(
        "POST",
        f"subscriptions/{sub}:pull",
        {"maxMessages": n, "returnImmediately": True},
    ).get("receivedMessages", [])


def test_publish_pull_ack_byte_and_attribute_fidelity():
    topic, sub = _mk_pair()
    sent = {
        f"k{i}": (bytes([i, 0, 255, 10]) + f"payload-{i}".encode(), str(i))
        for i in range(20)
    }
    _publish(
        topic,
        [
            {
                "data": base64.b64encode(data).decode(),
                "attributes": {"key": k, "idx": idx},
            }
            for k, (data, idx) in sent.items()
        ],
    )
    got, ack_ids = {}, []
    for _ in range(10):
        for rm in _pull(sub, 10):
            m = rm["message"]
            got[m["attributes"]["key"]] = (
                base64.b64decode(m.get("data", "")),
                m["attributes"]["idx"],
            )
            ack_ids.append(rm["ackId"])
        if len(got) == len(sent):
            break
    # exact byte + attribute round-trip, including NUL/0xFF/newline bytes
    assert got == sent
    _call("POST", f"subscriptions/{sub}:acknowledge", {"ackIds": ack_ids})
    assert _pull(sub, 10) == []  # acked messages never redeliver


def test_nack_redelivers_unacked_batch():
    topic, sub = _mk_pair()
    _publish(topic, [{"data": base64.b64encode(f"m{i}".encode()).decode()} for i in range(5)])
    first = []
    for _ in range(10):
        first += _pull(sub, 5)
        if len(first) == 5:
            break
    assert len(first) == 5
    # nack = modifyAckDeadline 0: the live service's redelivery trigger,
    # which FileBroker mirrors with immediate lease expiry
    _call(
        "POST",
        f"subscriptions/{sub}:modifyAckDeadline",
        {"ackIds": [rm["ackId"] for rm in first], "ackDeadlineSeconds": 0},
    )
    redelivered = []
    for _ in range(10):
        redelivered += _pull(sub, 5)
        if len(redelivered) == 5:
            break
    assert {rm["message"]["messageId"] for rm in redelivered} == {
        rm["message"]["messageId"] for rm in first
    }


def test_ordering_key_preserves_publish_order():
    topic, sub = _mk_pair(ordering=True)
    n = 10
    _publish(
        topic,
        [
            {
                "data": base64.b64encode(f"seq-{i}".encode()).decode(),
                "orderingKey": "k1",
            }
            for i in range(n)
        ],
    )
    seen: list[str] = []
    for _ in range(20):
        batch = _pull(sub, n)
        seen += [base64.b64decode(rm["message"].get("data", "")).decode() for rm in batch]
        _call(
            "POST",
            f"subscriptions/{sub}:acknowledge",
            {"ackIds": [rm["ackId"] for rm in batch]},
        )
        if len(seen) == n:
            break
    assert seen == [f"seq-{i}" for i in range(n)]
