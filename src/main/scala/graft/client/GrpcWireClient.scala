package graft.client

import java.io.ByteArrayOutputStream
import java.util.concurrent.{CompletableFuture, LinkedBlockingQueue, TimeUnit}

import io.netty.bootstrap.Bootstrap
import io.netty.buffer.{ByteBuf, Unpooled}
import io.netty.channel._
import io.netty.channel.nio.NioIoHandler
import io.netty.channel.socket.nio.NioSocketChannel
import io.netty.handler.codec.http2._
import io.netty.util.ReferenceCountUtil

/** gRPC-over-HTTP/2 transport on netty's frame codec — the consumer side of
  * the public gRPC wire format (POST per call, 5-byte length-prefixed
  * protobuf frames in DATA, grpc-status in trailers), matching the server
  * adapter in [[graft.server.grpc.GrpcServer]]. One instance = one HTTP/2
  * connection; every call opens a new stream (HTTP/2 multiplexing).
  *
  * Two call shapes:
  *  - [[call]] buffers a unary / short-stream response (optionally taking
  *    the first N messages of a live stream, then cancelling);
  *  - [[stream]] hands messages over one at a time through a BOUNDED queue,
  *    for replays larger than client memory: when the consumer lags, the
  *    event loop blocks on the queue, the TCP window fills, and the server's
  *    writability check paces the replay — end-to-end flow control.
  */
final class GrpcWireClient(host: String, port: Int) extends AutoCloseable {

  private val group = new MultiThreadIoEventLoopGroup(NioIoHandler.newFactory())
  private val ch: Channel = new Bootstrap()
    .group(group)
    .channel(classOf[NioSocketChannel])
    .handler(new ChannelInitializer[Channel] {
      override def initChannel(c: Channel): Unit =
        c.pipeline().addLast(
          Http2FrameCodecBuilder.forClient().build(),
          // inbound server-initiated streams are not used by gRPC
          new Http2MultiplexHandler(new ChannelInboundHandlerAdapter()))
    })
    .connect(host, port).syncUninterruptibly().channel()

  final case class Reply(messages: Vector[Array[Byte]], grpcStatus: Int)

  /** Incremental gRPC frame splitter: buffers partial frames across DATA
    * boundaries, emits each complete message once. */
  private final class FrameSplitter {
    private val buf = new ByteArrayOutputStream()
    def push(data: Array[Byte])(emit: Array[Byte] => Unit): Unit = {
      buf.write(data)
      val b = buf.toByteArray
      var i = 0
      var ok = true
      while (ok && i + 5 <= b.length) {
        val len = ((b(i + 1) & 0xff) << 24) | ((b(i + 2) & 0xff) << 16) |
          ((b(i + 3) & 0xff) << 8) | (b(i + 4) & 0xff)
        if (len >= 0 && i + 5 + len <= b.length) {
          emit(java.util.Arrays.copyOfRange(b, i + 5, i + 5 + len))
          i += 5 + len
        } else ok = false // partial trailing frame: wait for more DATA
      }
      if (i > 0) {
        buf.reset()
        buf.write(b, i, b.length - i)
      }
    }
  }

  /** Unary or prefix-of-stream call. `expectMessages > 0` takes the first N
    * messages of a live stream (e.g. subscribe) and cancels. */
  def call(path: String, body: Array[Byte],
      expectMessages: Int = -1, timeoutMs: Long = 30000): Reply = {
    val done = new CompletableFuture[Reply]()
    val handler = new ChannelInboundHandlerAdapter {
      private val split = new FrameSplitter
      private var msgs = Vector.empty[Array[Byte]]
      private var status = -1
      private def finish(ctx: ChannelHandlerContext): Unit = {
        done.complete(Reply(msgs, status))
        ctx.close()
      }
      override def channelRead(ctx: ChannelHandlerContext, m: AnyRef): Unit = m match {
        case h: Http2HeadersFrame =>
          val st = h.headers().get("grpc-status")
          if (st != null) status = st.toString.toInt
          if (h.isEndStream) finish(ctx)
        case d: Http2DataFrame =>
          try {
            val arr = new Array[Byte](d.content().readableBytes())
            d.content().readBytes(arr)
            split.push(arr)(msgs :+= _)
          } finally d.release()
          if (d.isEndStream) finish(ctx)
          else if (expectMessages > 0 && msgs.size >= expectMessages) {
            status = 0 // taking a prefix of a live stream: treat as OK
            finish(ctx)
          }
        case other => ReferenceCountUtil.release(other)
      }
      override def exceptionCaught(ctx: ChannelHandlerContext, cause: Throwable): Unit = {
        done.completeExceptionally(cause); ctx.close()
      }
    }
    val stream = openStream(path, body, handler)
    try done.get(timeoutMs, TimeUnit.MILLISECONDS)
    finally stream.close()
  }

  /** A server stream consumed message-by-message. `next()` blocks for the
    * next message; returns None at normal end-of-stream. `close()` cancels
    * (RST_STREAM via channel close) — safe mid-stream. */
  final class StreamHandle private[GrpcWireClient] (
      queue: LinkedBlockingQueue[AnyRef], streamCh: () => Channel) extends AutoCloseable {
    private var ended = false
    private var endStatus = -1

    /** grpc-status once the stream has ended normally; -1 before. */
    def status: Int = endStatus

    def next(timeoutMs: Long = 60000): Option[Array[Byte]] =
      if (ended) None
      else queue.poll(timeoutMs, TimeUnit.MILLISECONDS) match {
        case null => throw new java.util.concurrent.TimeoutException(
          s"no stream message within ${timeoutMs}ms")
        case GrpcWireClient.End(st) => ended = true; endStatus = st; None
        case GrpcWireClient.Failed(e) => ended = true; throw new RuntimeException(e)
        case m: Array[Byte] => Some(m)
        case other => throw new IllegalStateException(s"unexpected $other")
      }

    override def close(): Unit = { ended = true; streamCh().close() }
  }

  def stream(path: String, body: Array[Byte], queueCapacity: Int = 16): StreamHandle = {
    // Bounded hand-off: a full queue blocks the event loop thread, which
    // stops reading DATA frames -> TCP window closes -> the server's
    // isWritable backpressure loop pauses the replay. Crude but real
    // end-to-end flow control without manual WINDOW_UPDATE bookkeeping.
    val queue = new LinkedBlockingQueue[AnyRef](queueCapacity)
    val handler = new ChannelInboundHandlerAdapter {
      private val split = new FrameSplitter
      private var status = 0
      override def channelRead(ctx: ChannelHandlerContext, m: AnyRef): Unit = m match {
        case h: Http2HeadersFrame =>
          val st = h.headers().get("grpc-status")
          if (st != null) status = st.toString.toInt
          if (h.isEndStream) { queue.put(GrpcWireClient.End(status)); ctx.close() }
        case d: Http2DataFrame =>
          try {
            val arr = new Array[Byte](d.content().readableBytes())
            d.content().readBytes(arr)
            split.push(arr)(queue.put(_))
          } finally d.release()
          if (d.isEndStream) { queue.put(GrpcWireClient.End(status)); ctx.close() }
        case other => ReferenceCountUtil.release(other)
      }
      override def channelInactive(ctx: ChannelHandlerContext): Unit = {
        queue.offer(GrpcWireClient.End(status)) // idempotent-enough: consumer stops at first End
        ctx.fireChannelInactive()
      }
      override def exceptionCaught(ctx: ChannelHandlerContext, cause: Throwable): Unit = {
        queue.offer(GrpcWireClient.Failed(cause)); ctx.close()
      }
    }
    val sc = openStream(path, body, handler)
    new StreamHandle(queue, () => sc)
  }

  private def openStream(path: String, body: Array[Byte],
      handler: ChannelHandler): Channel = {
    val stream = new Http2StreamChannelBootstrap(ch).handler(handler)
      .open().syncUninterruptibly().getNow
    val headers = new DefaultHttp2Headers()
    headers.method("POST").scheme("http").path(path)
      .authority(s"$host:$port")
    headers.set("content-type", "application/grpc")
    headers.set("te", "trailers")
    stream.write(new DefaultHttp2HeadersFrame(headers))
    stream.writeAndFlush(new DefaultHttp2DataFrame(grpcFrame(body), true))
    stream
  }

  override def close(): Unit = {
    ch.close().syncUninterruptibly()
    group.shutdownGracefully(0, 500, TimeUnit.MILLISECONDS)
  }

  private def grpcFrame(m: Array[Byte]): ByteBuf = {
    val b = Unpooled.buffer(5 + m.length)
    b.writeByte(0); b.writeInt(m.length); b.writeBytes(m); b
  }
}

object GrpcWireClient {
  private final case class End(status: Int)
  private final case class Failed(cause: Throwable)
}
