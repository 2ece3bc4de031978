// Minimal FUNCTIONAL cppzmq replacement over the system libzmq C ABI
// (libzmq.so.5 is present but the cppzmq/zmq.h headers are not).
// Implements exactly the API surface imagerepresentation.cpp uses:
// context_t, socket_t(connect/send/recv/close), message_t(data/size).
#pragma once
#include <cstdlib>
#include <cstring>
#include <string>
#include <stdexcept>

#define ZMQ_REQ 3

extern "C" {
void *zmq_ctx_new(void);
int zmq_ctx_term(void *);
void *zmq_socket(void *, int);
int zmq_close(void *);
int zmq_connect(void *, const char *);
typedef struct { unsigned char _[64]; } zmq_msg_t;
int zmq_msg_init(zmq_msg_t *);
int zmq_msg_init_size(zmq_msg_t *, size_t);
void *zmq_msg_data(zmq_msg_t *);
size_t zmq_msg_size(zmq_msg_t *);
int zmq_msg_close(zmq_msg_t *);
int zmq_msg_send(zmq_msg_t *, void *, int);
int zmq_msg_recv(zmq_msg_t *, void *, int);
}

namespace zmq {

class message_t {
public:
    message_t() { zmq_msg_init(&m_); }
    explicit message_t(size_t n) { zmq_msg_init_size(&m_, n); }
    ~message_t() { zmq_msg_close(&m_); }
    void *data() { return zmq_msg_data(&m_); }
    size_t size() { return zmq_msg_size(&m_); }
    zmq_msg_t *handle() { return &m_; }
private:
    zmq_msg_t m_;
};

class context_t {
public:
    explicit context_t(int) : ctx_(zmq_ctx_new()) {}
    ~context_t() { if (ctx_) zmq_ctx_term(ctx_); }
    void *ctx_;
};

class socket_t {
public:
    socket_t(context_t &c, int type) : s_(zmq_socket(c.ctx_, type)) {}
    ~socket_t() { close(); }
    void connect(const std::string &addr) {
        if (zmq_connect(s_, addr.c_str()) != 0)
            throw std::runtime_error("zmq_connect failed: " + addr);
    }
    void send(message_t &m) {
        if (zmq_msg_send(m.handle(), s_, 0) < 0)
            throw std::runtime_error("zmq_msg_send failed");
    }
    void recv(message_t *m) {
        if (zmq_msg_recv(m->handle(), s_, 0) < 0)
            throw std::runtime_error("zmq_msg_recv failed");
    }
    void close() { if (s_) { zmq_close(s_); s_ = nullptr; } }
private:
    void *s_;
};

}  // namespace zmq
